package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval sweep-line over half-open intervals [start, end): peak
  * concurrency (max number of simultaneously-active intervals) and the
  * earliest instant attaining it.
  *
  * The classic formulation is a global ORDER BY + running sum — which in
  * Spark's window API (`Window.orderBy` with no partition key) funnels
  * every boundary through ONE reducer. This op stays distributed:
  * boundary deltas (+1 at start, −1 at end) are aggregated per timestamp
  * first (one map-side-combined groupBy — also what makes the order key
  * unique, [[PrefixSum]]'s determinism contract), then the running sum is
  * the two-pass distributed prefix sum, and the argmax reduces with a
  * single `min(struct(−conc, t))` aggregate — no second pass, no window.
  *
  * Half-open semantics fall out of the per-timestamp aggregation: an
  * interval ending at t cancels one starting at t before the sum ever
  * sees them. Net-zero timestamps are dropped — concurrency does not
  * change there, and any peak value is still attained at some
  * positive-delta boundary at or before them.
  */
object Sweep {

  /** One row: (peak_concurrent, first_peak_t) over long-typed boundary
    * columns. Empty input → (0, null).
    */
  def peakConcurrency(intervals: DataFrame, startCol: String,
      endCol: String): DataFrame = {
    val deltas = intervals
      .select(col(startCol).cast("long").as("t"), lit(1L).as("d"))
      .unionAll(intervals
        .select(col(endCol).cast("long").as("t"), lit(-1L).as("d")))
      .groupBy("t").agg(sum(col("d")).as("d"))
      .where(col("d") =!= 0L)
    val conc = PrefixSum.exclusive(deltas, "t", "d", "_prior")
      .select(col("t"), (col("_prior") + col("d")).as("conc"))
    // lexicographic min of (−conc, t): highest concurrency, earliest t
    conc.agg(min(struct((-col("conc")).as("nc"), col("t").as("t"))).as("m"))
      .select(coalesce(-col("m.nc"), lit(0L)).as("peak_concurrent"),
        col("m.t").as("first_peak_t"))
  }
}
