package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped simple OLS (y on x) from exact integer sufficient statistics.
  *
  * The six sums (n, Σx, Σx², Σy, Σxy, Σy²) are computed on integer-scaled
  * values — x as Long, y as round(y·1e6) Long, every per-row term cast to
  * DECIMAL(38,0) before summing (round-14 micros-headroom audit: Σ(x·ys)
  * passed 2⁶³ at ~7e8 rows/group on the q213 domain; DECIMAL sums match
  * DuckDB's BIGINT→HUGEINT exactness) — so the
  * aggregation is EXACT and order-independent: no FP tree-sum
  * nondeterminism, which is what makes the closed-form solution
  * replayable bit-for-bit on another engine. Only the final closed form
  * runs in DOUBLE, on identical integer inputs with an identical
  * operation order, so both engines produce the same IEEE result.
  *
  * Scale shape: one map-side-combined groupBy over skinny longs — the
  * same shuffle profile as any grouped sum; the closed form is a
  * projection on the group-sized result. This is the textbook
  * distributed-OLS decomposition (sufficient statistics, not row
  * iteration).
  */
object Regression {

  /** Per-group (n, slope, intercept, r2), 1e-6-rounded. Groups where x is
    * constant get null slope/intercept/r2; constant y additionally nulls
    * r2 (0/0).
    *
    * Domain: |y| < ~3e3 (ys = round(y·1e6) < 3e9) so the per-row ys²
    * fits a Long — the same bound the DuckDB oracle's BIGINT ys·ys has,
    * and past it BOTH engines raise (ANSI long overflow) rather than
    * degrade. Wider y needs a wider per-row promotion on both sides.
    */
  def groupedOls(df: DataFrame, groupCol: String, x: Column, y: Column)
      : DataFrame = {
    val sums = df
      .select(col(groupCol).as("grp"), x.cast("long").as("_x"),
        round(y * 1000000).cast("long").as("_ys"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        // EVERY sum promotes per row to DECIMAL(38,0) (round-14
        // micros-headroom audit): per-row terms stay Long — so the
        // per-row overflow contract is symmetric with DuckDB's BIGINT
        // products (both raise) — but the SUMS are exact to 1e38, like
        // DuckDB's BIGINT→HUGEINT sum. Before this, Σ(x·ys) raised at
        // ~7e8 rows/group for the q213 domain (x ≤ 23, value ≤ 561 →
        // x·ys ≤ 1.3e10) while the oracle kept computing; the others had
        // 1.6e10–1.7e16-row headroom but cost the same to close.
        sum(col("_x").cast("decimal(38,0)")).as("sx"),
        sum((col("_x") * col("_x")).cast("decimal(38,0)")).as("sxx"),
        sum(col("_ys").cast("decimal(38,0)")).as("sy"),
        sum((col("_x") * col("_ys")).cast("decimal(38,0)")).as("sxy"),
        sum((col("_ys") * col("_ys")).cast("decimal(38,0)")).as("syy"),
        // min/max back the constant-x/constant-y tests below: exact at
        // any scale, unlike a decimal n·s − s² product that can overflow
        min(col("_x")).as("mnx"), max(col("_x")).as("mxx"),
        min(col("_ys")).as("mny"), max(col("_ys")).as("mxy"))
    val nD = col("n").cast("double")
    // n·Σxy can pass 2⁶³; form every cross term in double FROM the exact
    // integer sums — products of exactly-represented integers, correctly
    // rounded, so any engine replaying this order gets the same bits
    val cov = nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val denX = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val denY = nD * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    // The constant-x / constant-y NULL contract is decided EXACTLY: once
    // n·sxx or sx² passes 2⁵³ the double cancellation above can leave a
    // tiny nonzero for a truly constant group (→ garbage slope instead of
    // null). The zero test is min==max on the raw integer values —
    // equivalent to "variance numerator is zero" (Cauchy–Schwarz equality
    // ⟺ all values equal) but exact at ANY scale with no intermediate
    // products: the previous DECIMAL(38,0) n·syy − sy² form could
    // silently NULL on capped-precision overflow past ~1e38 and take a
    // genuinely-varying group's r2 with it. The closed-form VALUES keep
    // the double order above, which both engines replay identically.
    val xVaries = col("mnx") =!= col("mxx")
    val yVaries = col("mny") =!= col("mxy")
    val slopeScaled = cov / denX // y still in 1e6 units
    def r6(c: Column): Column = graft.functions.Exact.roundPortable(c, 6)
    sums.select(col("grp").as(groupCol), col("n"),
      r6(when(xVaries, slopeScaled / 1000000.0)).as("slope"),
      r6(when(xVaries,
        (col("sy").cast("double") / nD -
          slopeScaled * (col("sx").cast("double") / nD)) / 1000000.0))
        .as("intercept"),
      r6(when(xVaries && yVaries, cov * cov / (denX * denY)))
        .as("r2"))
  }
}
