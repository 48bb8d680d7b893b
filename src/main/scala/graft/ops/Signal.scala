package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential per-key signal conditioning — the two telemetry-cleaning
  * folds that CANNOT be written as window functions because each output
  * depends on previously-KEPT/accumulated state, not on a fixed frame:
  *
  *  - debounce: keep an event only if it lands more than `tolUs` after
  *    the last KEPT event of its key (distinct from sessionization: with
  *    events at 0/3/6 and tol 5, debounce keeps {0, 6} — the gap measures
  *    from the kept set, not the previous raw event);
  *  - EWMA: acc' = acc + α(x − acc), the drift monitor.
  *
  * Both run as ONE groupBy(key) shuffle followed by a per-key sorted fold
  * (higher-order aggregate) — per-key state lives in one task, exactly
  * like the reference's per-episode loops, but keyed and distributed.
  * The fold order is pinned by (ts, id), so an oracle can replay it with
  * an ORDER BY-ed list_reduce.
  *
  * Per-key memory is the collected event list, and unlike window
  * operators an AGGREGATION buffer cannot spill — so the per-key bound is
  * a guard, not a scaladoc note (round-15; the coedges/invertedIndex
  * discipline): a pre-aggregation `count(*) OVER (PARTITION BY key)`
  * rides the SAME exchange the groupBy needs anyway (the window operator
  * spill-sorts, so the check itself is safe on the hot key), and any key
  * past `maxEventsPerKey` refuses loudly BEFORE the buffer builds. These
  * folds genuinely need every event — truncation would silently change
  * the answer — so the guard refuses rather than caps; callers who have
  * measured their key bound raise the knob explicitly. The default
  * (200k events ≈ 10–15 MB of struct buffer per key) is bot/crawler
  * territory for user-keyed telemetry, far past organic per-user volume.
  */
object Signal {

  private[ops] val DefaultMaxEventsPerKey = 200000

  /** The refuse-loudly pre-aggregation guard shared by the per-key
    * full-history folds ([[debounce]], [[ewma]],
    * [[Behavior.funnel]]): count rows per key on the grouped exchange and
    * raise a NAMED error on any key past the cap. `what` names the
    * operator in the message.
    */
  private[ops] def guardEventsPerKey(df: DataFrame, keyCols: Seq[String],
      maxEventsPerKey: Int, what: String): DataFrame = {
    require(maxEventsPerKey > 0,
      s"maxEventsPerKey must be > 0, got $maxEventsPerKey")
    val n = count(lit(1)).over(Window.partitionBy(keyCols.map(col): _*))
    df.withColumn("_n_key", n)
      .filter(assert_true(col("_n_key") <= maxEventsPerKey,
        format_string(
          s"$what: key %s has %d events (cap $maxEventsPerKey) — the " +
            "per-key fold materializes the full event history in ONE " +
            "non-spillable aggregation buffer, so a hot key (bot/crawler " +
            "account) is an executor OOM, not a slow query; filter or " +
            "pre-aggregate the key upstream, or pass maxEventsPerKey " +
            "explicitly if the per-key bound is measured",
          concat_ws("/", keyCols.map(c => col(c).cast("string")): _*),
          col("_n_key"))).isNull)
      .drop("_n_key")
  }

  /** → (key cols…, n_events, n_kept, first_kept, last_kept). */
  def debounce(df: DataFrame, keyCols: Seq[String], tsUs: Column,
      idCol: Column, tolUs: Long,
      maxEventsPerKey: Int = DefaultMaxEventsPerKey): DataFrame = {
    val sorted = sort_array(collect_list(struct(tsUs.as("ts"), idCol.as("id"))))
    val kept = aggregate(col("_evs"),
      array().cast("array<bigint>"),
      (acc, e) => when(size(acc) === 0 ||
          e.getField("ts") - element_at(acc, -1) > lit(tolUs),
        concat(acc, array(e.getField("ts")))).otherwise(acc))
    guardEventsPerKey(df, keyCols, maxEventsPerKey, "Signal.debounce")
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_events"), sorted.as("_evs"))
      .withColumn("_kept", kept)
      .select(keyCols.map(col) ++ Seq(col("n_events"),
        size(col("_kept")).cast("long").as("n_kept"),
        element_at(col("_kept"), 1).as("first_kept"),
        element_at(col("_kept"), -1).as("last_kept")): _*)
  }

  /** → (key cols…, n, ewma) — final EWMA of `valueCol` in (ts, id) order,
    * α given in permille so the contract is integer-parameterized; the
    * fold arithmetic is the pinned IEEE sequence
    * acc + (α/1000)·(x − acc).
    */
  def ewma(df: DataFrame, keyCols: Seq[String], tsUs: Column, idCol: Column,
      valueCol: Column, alphaPermille: Int,
      maxEventsPerKey: Int = DefaultMaxEventsPerKey): DataFrame = {
    val alpha = lit(alphaPermille / 1000.0)
    val sorted = sort_array(collect_list(
      struct(tsUs.as("ts"), idCol.as("id"), valueCol.cast("double").as("v"))))
    val folded = aggregate(col("_evs"), lit(null).cast("double"),
      (acc, e) => when(acc.isNull, e.getField("v"))
        .otherwise(acc + alpha * (e.getField("v") - acc)))
    guardEventsPerKey(df, keyCols, maxEventsPerKey, "Signal.ewma")
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sorted.as("_evs"))
      .select(keyCols.map(col) ++ Seq(col("n"),
        folded.as("ewma")): _*)
  }
}
