package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
  * Per-key memory is the collected event list (same bound the corpus
  * already accepts for journeys/funnel); keys are user-sized, not
  * corpus-sized. The fold order is pinned by (ts, id), so an oracle can
  * replay it with an ORDER BY-ed list_reduce.
  */
object Signal {

  /** → (key cols…, n_events, n_kept, first_kept, last_kept). */
  def debounce(df: DataFrame, keyCols: Seq[String], tsUs: Column,
      idCol: Column, tolUs: Long): DataFrame = {
    val sorted = sort_array(collect_list(struct(tsUs.as("ts"), idCol.as("id"))))
    val kept = aggregate(col("_evs"),
      array().cast("array<bigint>"),
      (acc, e) => when(size(acc) === 0 ||
          e.getField("ts") - element_at(acc, -1) > lit(tolUs),
        concat(acc, array(e.getField("ts")))).otherwise(acc))
    df.groupBy(keyCols.map(col): _*)
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
      valueCol: Column, alphaPermille: Int): DataFrame = {
    val alpha = lit(alphaPermille / 1000.0)
    val sorted = sort_array(collect_list(
      struct(tsUs.as("ts"), idCol.as("id"), valueCol.cast("double").as("v"))))
    val folded = aggregate(col("_evs"), lit(null).cast("double"),
      (acc, e) => when(acc.isNull, e.getField("v"))
        .otherwise(acc + alpha * (e.getField("v") - acc)))
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sorted.as("_evs"))
      .select(keyCols.map(col) ++ Seq(col("n"),
        folded.as("ewma")): _*)
  }
}
