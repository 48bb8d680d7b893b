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
  *
  * Two output forms:
  *  - [[mannWhitney]] — the gate form: exact `u1_x2` BIGINT beside z.
  *    Documented wall (PLANS.md micros-headroom table): U ~ n²/4
  *    outgrows ANY 64-bit output at n ≈ 6.1e9 events, and both engines
  *    raise loudly near their ~2–3e9-event internal walls.
  *  - [[mannWhitneyZ]] — the scale form (round-15, the waiver's own
  *    remedy): drops the exact-U output column and promotes the rank-sum
  *    internals per-row to DECIMAL(38,0), so the z statistic — itself
  *    well-scaled in DOUBLE — survives any physically-reachable sample
  *    (per-row term ≤ ~2n² needs n ≲ 7e18; the Long value-counts
  *    feeding it cap row counts at 9.2e18 first).
  */
object RankTest {

  /** Both samples collapsed to the value-distinct table with exclusive
    * rank offsets: (v, c1, c2, t, _prior). The one shuffle both forms
    * share.
    */
  private[graft] def rankedCounts(df: DataFrame, valueCol: Column,
      inA: Column): DataFrame = {
    val counts = df
      .select(valueCol.cast("double").as("v"),
        when(inA, 1L).otherwise(0L).as("_a"))
      .groupBy("v")
      .agg(sum(col("_a")).as("c1"), sum(lit(1L) - col("_a")).as("c2"))
      .withColumn("t", col("c1") + col("c2"))
    PrefixSum.exclusive(counts, "v", "t", "_prior")
  }

  /** The shared tail: tie term, all-tied detector, and the z formula over
    * whatever exact representation `r1x2Term` produced (Long for the gate
    * form, DECIMAL(38,0) for the scale form); `keepExactU` additionally
    * emits the exact-U column (gate form only).
    */
  private[graft] def zFromRanked(ranked: DataFrame, r1x2Term: Column,
      keepExactU: Boolean): DataFrame = {
    val sums = ranked.agg(
      sum(col("c1")).as("n1"),
      sum(col("c2")).as("n2"),
      sum(r1x2Term).as("r1_x2"),
      // tie term Σ(t³ − t): t is a PER-VALUE count, and one dominant value
      // (t ≳ 2.1M) already pushes t³ past 2⁶³ — and only DuckDB's SUM
      // promotes to HUGEINT; a per-row BIGINT t*t*t raises on overflow
      // there just as Spark's long product would raise (ANSI) or wrap. So
      // BOTH sides promote per row: DECIMAL(38,0) here, CAST(t AS HUGEINT)
      // in the oracle SQL. Exact to t ≈ 4.6e12; it only feeds the
      // variance double anyway.
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
    // exact in the term's own type: Long − Long for the gate form,
    // DECIMAL − DECIMAL for the scale form (n1(n1+1) promoted to match)
    val u1x2 =
      if (keepExactU) col("r1_x2") - col("n1") * (col("n1") + 1)
      else col("r1_x2") -
        col("n1").cast("decimal(38,0)") * (col("n1") + 1)
    // n ≤ 1 → divisor 0 → NULL tie correction → NULL variance → NULL z
    // (when() evaluates branches conditionally, so the division is never
    // executed on the degenerate row — ANSI would raise, not NaN)
    val tieCorr = when(n > 1.0, col("ties").cast("double") / (n * (n - 1.0)))
    val variance = n1 * n2 / 12.0 * ((n + 1.0) - tieCorr)
    val z = when(col("nvals") > 1 && variance > 0,
      graft.functions.Exact.roundPortable(
        (u1x2.cast("double") - n1 * n2) / (lit(2.0) * sqrt(variance)), 6))
      .as("z")
    if (keepExactU)
      sums.select(col("n1"), col("n2"), u1x2.as("u1_x2"), z)
    else
      sums.select(col("n1"), col("n2"), z)
  }

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
  def mannWhitney(df: DataFrame, valueCol: Column, inA: Column): DataFrame =
    zFromRanked(rankedCounts(df, valueCol, inA),
      // 2·R₁ = Σ c₁·(2·prior + t + 1), exact Long (raises loudly past the
      // documented ~2–3e9-event wall — use mannWhitneyZ beyond it)
      col("c1") * (col("_prior") * 2 + col("t") + 1),
      keepExactU = true)

  /** One row: (n1, n2, z) — the z-only scale form. Identical z (same IEEE
    * formula over the same exact integers, spec-pinned equal on the gate
    * domain) with every rank-sum term promoted per-row to DECIMAL(38,0),
    * lifting the exact-U form's ~2–3e9-event overflow wall for pipelines
    * that need the test at corpus scale; the NULL-z degenerate contracts
    * are unchanged.
    */
  def mannWhitneyZ(df: DataFrame, valueCol: Column, inA: Column): DataFrame =
    zFromRanked(rankedCounts(df, valueCol, inA),
      // prior is promoted BEFORE doubling so no Long product appears
      // anywhere in the term — the whole chain is decimal arithmetic
      col("c1").cast("decimal(38,0)") *
        (col("_prior").cast("decimal(38,0)") * 2 + col("t") + 1),
      keepExactU = false)
}
