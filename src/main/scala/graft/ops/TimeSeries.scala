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
      valueAgg: Column, valueName: String): DataFrame = {
    val hourly = df
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n_events"), valueAgg.as("_v"))
    val spine = hourly
      .groupBy(col(keyCol))
      .agg(min("hour").as("lo"), max("hour").as("hi"))
      .select(col(keyCol),
        explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR")))
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
}
