package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group quantile normalization — map every group's score
  * distribution onto the POOLED corpus distribution (the microarray
  * "quantile normalization" recipe applied to curation: heuristic quality
  * scores are only rank-comparable WITHIN a source, because each source's
  * scorer sees different length/style priors; calibrating each score to
  * the global quantile at the same within-source percent rank makes one
  * threshold meaningful across sources).
  *
  * Deterministic contract: percent rank uses the (score, id) total order;
  * the normalized value is the pooled order statistic at index
  * `floor(pr·(N−1) + 0.5)` — round-half-up in portable IEEE ops.
  *
  * Scale shape: one per-group window (partitioned by group — distributed),
  * one global ranking via [[PrefixSum.rowNumber]] (range shuffle +
  * O(partitions) driver), and one equi-join on the computed index. No
  * partition-less window, no collect of the distribution.
  */
object Calibrate {

  /** Returns `df`'s (idCol, groupCol, scoreCol) plus `norm_<scoreCol>` —
    * the pooled order statistic at the doc's within-group percent rank.
    */
  def quantileNormalize(df: DataFrame, idCol: String, groupCol: String,
      scoreCol: String): DataFrame = {
    val base = df.select(col(idCol), col(groupCol), col(scoreCol))
    val n = base.count()
    val w = Window.partitionBy(groupCol).orderBy(col(scoreCol), col(idCol))
    val ranked = base.withColumn("_pr", percent_rank().over(w))
      .withColumn("_tidx",
        (floor(col("_pr") * (n - 1) + 0.5) + 1).cast("long"))
    val pooled = PrefixSum.rowNumber(
        base.select(col(scoreCol).as("_gscore"), col(idCol).as("_gid")),
        Seq("_gscore", "_gid"), "_gidx")
      .select(col("_gscore"), col("_gidx"))
    ranked
      .join(pooled, ranked("_tidx") === pooled("_gidx"))
      .select(col(idCol), col(groupCol), col(scoreCol),
        col("_gscore").as(s"norm_$scoreCol"))
  }
}
