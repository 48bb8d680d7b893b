package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra: merge overlapping-or-touching intervals per key — the
  * coverage primitive behind "total active time from overlapping
  * sessions", video-segment coverage, and validity-range compaction.
  *
  * Classic sweep, expressed as two key-partitioned windows (distributes
  * across keys, no self-join):
  *   1. order by (lo, hi); the exclusive running max of `hi` over all
  *      PRECEDING rows is the sweep front;
  *   2. a new merged group starts exactly when `lo` strictly exceeds that
  *      front (touching intervals, lo == front, merge — pinned contract);
  *   3. group id = running sum of the new-group flag; each merged interval
  *      is then (min lo, max hi) of its group, and since every non-first
  *      member overlaps/touches the front, coverage per group is simply
  *      max hi − min lo.
  *
  * Degenerate inputs (hi < lo) are rejected rows the caller should filter;
  * they would corrupt the sweep silently, so this op REQUIRES hi ≥ lo and
  * filters violations out (counted nowhere — callers wanting an audit
  * should predicate first).
  */
object Intervals {

  /** → (key, merged_lo, merged_hi, n_merged) — one row per merged
    * interval; `n_merged` = source intervals folded into it.
    */
  def merge(df: DataFrame, keyCol: String, lo: Column, hi: Column): DataFrame = {
    val base = df.select(col(keyCol), lo.as("_lo"), hi.as("_hi"))
      .where(col("_hi") >= col("_lo"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("_lo"), col("_hi"))
    val front = max(col("_hi"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    base
      .withColumn("_new", when(front.isNull || col("_lo") > front, 1L)
        .otherwise(0L))
      .withColumn("_grp", sum(col("_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("_grp"))
      .agg(min(col("_lo")).as("merged_lo"), max(col("_hi")).as("merged_hi"),
        count(lit(1)).as("n_merged"))
      .drop("_grp")
  }
}
