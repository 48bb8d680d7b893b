package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series densification: per-key gap-fill against a generated bucket
  * spine plus forward fill — the densify step any downstream windowed
  * model (drift monitors, per-source rate curves, training-mix
  * dashboards) needs before it can difference or resample a sparse event
  * stream.
  *
  * Scale shape: the spine is generated per KEY from that key's own
  * [min, max] bucket range (`sequence` + `explode` — rows proportional to
  * key_count × buckets, never a cross join against a global calendar);
  * the join back to observed buckets is a (key, bucket) equi-join; the
  * forward fill is a key-partitioned running `last(ignoreNulls)` window —
  * distributed by key, never a partition-less window.
  */
object TimeSeries {

  /** Hourly gap-fill + forward fill. Returns one row per (key, hour) in
    * each key's observed hour range: `n_events` (0 on gaps) and
    * `filled_<valueCol>` = the running last non-null hourly aggregate.
    */
  def gapFillHourly(df: DataFrame, keyCol: String, tsCol: String,
      valueAgg: Column, valueName: String,
      maxSpanHours: Long = 200000L): DataFrame = {
    require(maxSpanHours > 0, s"maxSpanHours must be > 0, got $maxSpanHours")
    val hourly = df
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n_events"), valueAgg.as("_v"))
    // amplification cap (round-13, the RangeJoin pattern): ONE corrupt
    // timestamp (epoch-0, year-9999) silently densifies its key's spine
    // by the whole span — at corpus scale that's an OOM, not a raise.
    // 200k hours ≈ 23 years covers any real monitoring window; a wider
    // spine is a data bug, refused loudly with the knob in the message.
    // NULL span passes THROUGH, not into the raise (round-14 advice): a key
    // whose timestamps are all NULL has lo=hi=NULL, so span is NULL and
    // when(NULL <= cap) is not-true — without the isNull arm such keys
    // would crash with a misleading "spans null hours" message. With it,
    // sequence(NULL, NULL) is NULL and explode drops the key, preserving
    // the pre-cap behavior (no spine rows for an unobservable key).
    val span = (unix_timestamp(col("hi")) - unix_timestamp(col("lo"))) / 3600L
    val spine = hourly
      .groupBy(col(keyCol))
      .agg(min("hour").as("lo"), max("hour").as("hi"))
      .select(col(keyCol),
        explode(when(col("lo").isNull || span <= maxSpanHours,
          sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR")))
          .otherwise(raise_error(format_string(
            "graft.TimeSeries.gapFillHourly: key spans %s hours " +
              s"(cap $maxSpanHours) — a corrupt timestamp would densify " +
              "the spine into OOM; fix the data or raise maxSpanHours",
            span))))
          .as("hour"))
    val w = Window.partitionBy(keyCol).orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(hourly, Seq(keyCol, "hour"), "left")
      .select(col(keyCol), col("hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("_v"), ignoreNulls = true).over(w)
          .as(s"filled_$valueName"))
  }

  /** One-sided CUSUM changepoint detector (zero allowance) over a
    * pre-aggregated (period, count) series, in EXACT integer arithmetic:
    * deviations are scaled by the period count D (dev = n·D − total, so
    * the mean needs no division), and the recursive clamp
    * S_t = max(0, S_{t−1} + dev_t) is rewritten as the closed form
    * cum_t − min(0, min_{j≤t} cum_j) — a plain cumulative sum minus a
    * running minimum, two windows instead of an inexpressible recursion.
    * The alarm fires when S exceeds `num/den` of the total mass (again
    * integer-compared at the D scale: S·den > total·D·num).
    *
    * Scale shape: the input is the PERIOD-aggregated table (one row per
    * day/hour — grid-sized, produced upstream by a map-side-combined
    * groupBy), so the global-order windows here run over the grid, never
    * the event log.
    */
  def cusum(perPeriod: DataFrame, periodCol: String, countCol: String,
      alarmNum: Int, alarmDen: Int): DataFrame = {
    require(alarmNum > 0 && alarmDen > 0, "alarm fraction must be positive")
    val w = Window.orderBy(periodCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = perPeriod.agg(
      count(lit(1)).as("_d"),
      sum(col(countCol).cast("long")).as("_total"))
    perPeriod
      .select(col(periodCol), col(countCol).cast("long").as("n"))
      .crossJoin(broadcast(totals))
      .withColumn("_dev", col("n") * col("_d") - col("_total"))
      .withColumn("_cum", sum(col("_dev")).over(w))
      .withColumn("cusum_scaled",
        col("_cum") - least(lit(0L), min(col("_cum")).over(w)))
      .select(col(periodCol), col("n"), col("cusum_scaled"),
        (col("cusum_scaled") * alarmDen >
          col("_total") * col("_d") * alarmNum).cast("long").as("is_alarm"))
  }
}
