package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Deterministic sampling for training-data curation. Unlike
  * `DataFrame.sample` (seeded per-partition RNG — resample on any
  * repartition, not reproducible across engines or cluster shapes), these
  * samples are pure functions of the row KEY: the same row is in or out of
  * the sample on every run, every engine, every partitioning. That is the
  * property a data pipeline needs — samples that are stable across
  * incremental runs, and strata that can be re-derived from the key alone.
  *
  * Scale shape: the keep/drop decision is a codegen'd hash expression per
  * row (no shuffle, no state); the stratum fraction arrives via a
  * broadcast-joined config frame, so the corpus is scanned exactly once.
  */
object Sampling {

  /** Keep rows whose seeded unit-interval hash of `key` is < `fraction`.
    * E[kept] = fraction · n, deterministic in the key.
    */
  def hashSample(df: DataFrame, key: Column, seed: String, fraction: Column): DataFrame =
    df.filter(Hashing.hashUnit(key.cast("string"), seed) < fraction)

  /** Stratified deterministic sample: per-stratum keep fractions from a
    * small (stratum, fraction) frame (broadcast), strata absent from the
    * frame fall back to `defaultFraction`. `fractions` must have exactly
    * two columns: the stratum key (named like `stratumCol`) and
    * `fraction`.
    */
  def stratified(df: DataFrame, stratumCol: String, fractions: DataFrame,
      key: Column, seed: String, defaultFraction: Double): DataFrame = {
    val cols = fractions.columns.toSeq
    require(cols.contains(stratumCol) && cols.contains("fraction") && cols.size == 2,
      s"fractions frame must be ($stratumCol, fraction), got ${cols.mkString(",")}")
    df.join(broadcast(fractions), Seq(stratumCol), "left")
      .withColumn("_frac", coalesce(col("fraction"), lit(defaultFraction)))
      .filter(Hashing.hashUnit(key.cast("string"), seed) < col("_frac"))
      .drop("_frac", "fraction")
  }
}
