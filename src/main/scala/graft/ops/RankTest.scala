package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mann-Whitney U rank test between two samples, computed entirely from
  * EXACT integer rank sums so the statistic replays bit-for-bit on any
  * engine.
  *
  * Ties make naive ranking fractional (average ranks step by ½); this op
  * works at DOUBLED scale: for a tied block of size t starting after
  * `prior` earlier values, 2·avgrank = 2·prior + t + 1 (always an
  * integer), so 2·R₁ = Σ c₁(v)·(2·prior(v) + t(v) + 1) and
  * 2·U₁ = 2·R₁ − n₁(n₁+1) stay exact Longs. The tie-corrected normal
  * approximation
  *   z = (2U₁ − n₁n₂) / (2·√( n₁n₂/12 · ((n+1) − Σ(t³−t)/(n(n−1))) ))
  * is one fixed IEEE formula over those integers.
  *
  * Scale shape: one map-side-combined groupBy collapses both samples to
  * the VALUE-DISTINCT table (per-value counts c₁, c₂); the exclusive
  * rank offset `prior` is the distributed two-pass [[PrefixSum]] over
  * value order (never a global single-reducer window); the rank sums
  * reduce in one aggregate. Total shuffle: the value domain, not the
  * rows.
  */
object RankTest {

  /** One row: (n1, n2, u1_x2, z). `inA` marks sample 1; rows in neither
    * sample must be filtered by the caller (`inA` false ⇒ sample 2).
    *
    * Degenerate corners (round-12, found by a shrunk property case): z is
    * NULL when the test is undefined — n < 2 (the tie-correction divisor
    * n(n−1) is 0) or zero tie-corrected variance (every value tied). An
    * earlier comment claimed "z = 0/0 = NaN identically on both engines",
    * but Spark 4's ANSI mode raises DIVIDE_BY_ZERO for DOUBLE division
    * too — the divisions are therefore lazily guarded (`when` branches
    * evaluate conditionally) and the undefined test reports NULL, the
    * same currency as the other undefined-statistic contracts (grouped
    * OLS). The q218 oracle never feeds a degenerate sample; its SQL
    * carries the matching CASE guard for shape parity anyway.
    */
  def mannWhitney(df: DataFrame, valueCol: Column, inA: Column): DataFrame = {
    val counts = df
      .select(valueCol.cast("double").as("v"),
        when(inA, 1L).otherwise(0L).as("_a"))
      .groupBy("v")
      .agg(sum(col("_a")).as("c1"), sum(lit(1L) - col("_a")).as("c2"))
      .withColumn("t", col("c1") + col("c2"))
    val ranked = PrefixSum.exclusive(counts, "v", "t", "_prior")
    val sums = ranked.agg(
      sum(col("c1")).as("n1"),
      sum(col("c2")).as("n2"),
      // 2·R₁ = Σ c₁·(2·prior + t + 1)
      sum(col("c1") * (col("_prior") * 2 + col("t") + 1)).as("r1_x2"),
      // tie term Σ(t³ − t): t is a PER-VALUE count, and one dominant value
      // (t ≳ 2.1M) already pushes t³ past 2⁶³ — and only DuckDB's SUM
      // promotes to HUGEINT; a per-row BIGINT t*t*t raises on overflow
      // there just as Spark's long product would raise (ANSI) or wrap. So
      // BOTH sides promote per row: DECIMAL(38,0) here, CAST(t AS HUGEINT)
      // in the oracle SQL. Exact to t ≈ 4.6e12 (past that Spark's non-ANSI
      // decimal overflow degrades the sum to NULL → z = NULL, loud not
      // wrong); it only feeds the variance double anyway.
      sum((col("t") * col("t").cast("decimal(19,0)") * col("t") -
        col("t")).cast("decimal(38,0)")).as("ties"),
      // EXACT all-tied detector (round-12 advice): this aggregate runs
      // over the value-DISTINCT table, so "every value tied" is literally
      // "one row here". The variance>0 guard alone relied on
      // double(ties)/(n(n−1)) dividing exactly to n+1, which breaks once
      // t³−t exceeds 2⁵³ (n ≳ 2e5 all tied): rounding leaves a tiny
      // nonzero variance and a huge finite z instead of the documented
      // NULL. A row count is exact at any scale.
      count(lit(1)).as("nvals"))
    val n1 = col("n1").cast("double")
    val n2 = col("n2").cast("double")
    val n = (col("n1") + col("n2")).cast("double")
    val u1x2 = col("r1_x2") - col("n1") * (col("n1") + 1)
    // n ≤ 1 → divisor 0 → NULL tie correction → NULL variance → NULL z
    // (when() evaluates branches conditionally, so the division is never
    // executed on the degenerate row — ANSI would raise, not NaN)
    val tieCorr = when(n > 1.0, col("ties").cast("double") / (n * (n - 1.0)))
    val variance = n1 * n2 / 12.0 * ((n + 1.0) - tieCorr)
    sums.select(col("n1"), col("n2"), u1x2.as("u1_x2"),
      when(col("nvals") > 1 && variance > 0,
        graft.functions.Exact.roundPortable(
          (u1x2.cast("double") - n1 * n2) / (lit(2.0) * sqrt(variance)), 6))
        .as("z"))
  }
}
