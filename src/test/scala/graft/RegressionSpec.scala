package graft

import org.apache.spark.sql.functions._
import graft.ops.Regression

class RegressionSpec extends SparkSuite {

  test("exact line recovers slope/intercept with r2 = 1") {
    import spark.implicits._
    // y = 2x + 3 exactly
    val df = (0 to 10).map(x => ("g", x.toLong, 2.0 * x + 3.0))
      .toDF("grp", "x", "y")
    val r = Regression.groupedOls(df, "grp", col("x"), col("y")).head()
    assert(r.getDouble(2) == 2.0)
    assert(r.getDouble(3) == 3.0)
    assert(r.getDouble(4) == 1.0)
  }

  test("constant x nulls everything; constant y zeroes slope, nulls r2") {
    import spark.implicits._
    val df = Seq(
      ("cx", 5L, 1.0), ("cx", 5L, 2.0), ("cx", 5L, 3.0),
      ("cy", 1L, 7.0), ("cy", 2L, 7.0), ("cy", 3L, 7.0))
      .toDF("grp", "x", "y")
    val rows = Regression.groupedOls(df, "grp", col("x"), col("y"))
      .orderBy("grp").collect()
    val cx = rows(0)
    assert(cx.isNullAt(2) && cx.isNullAt(3) && cx.isNullAt(4))
    val cy = rows(1)
    assert(cy.getDouble(2) == 0.0 && cy.getDouble(3) == 7.0 && cy.isNullAt(4))
  }

  test("closed form matches a JVM replay on noisy data") {
    import spark.implicits._
    val pts = (1 to 50).map(i => (i.toLong, (i * 37 % 11) + 0.25 * i))
    val df = pts.map { case (x, y) => ("g", x, y) }.toDF("grp", "x", "y")
    val r = Regression.groupedOls(df, "grp", col("x"), col("y")).head()
    // replay the scaled-integer spec
    val xs = pts.map(_._1)
    val ys = pts.map(p => math.round(p._2 * 1e6))
    val n = xs.size.toDouble
    val (sx, sxx) = (xs.sum.toDouble, xs.map(x => x * x).sum.toDouble)
    val (sy, sxy) = (ys.sum.toDouble,
      xs.zip(ys).map { case (x, y) => x * y }.sum.toDouble)
    val syy = ys.map(y => BigDecimal(y) * BigDecimal(y)).sum.toDouble
    val cov = n * sxy - sx * sy
    val denX = n * sxx - sx * sx
    def r6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    assert(r.getDouble(2) == r6((cov / denX) / 1e6))
    assert(r.getDouble(4) == r6(cov * cov / (denX * (n * syy - sy * sy))))
  }

  test("constant-x null contract survives double cancellation error") {
    import spark.implicits._
    // x = 100000007 over n = 5 rows: n·sxx and sx² both pass 2⁵³, and the
    // DOUBLE cancellation leaves denX = 32.0 (nonzero!) for a group whose
    // x never varies — the old denX != 0.0 gate emitted a garbage slope
    // here. The exact min==max zero-test must yield null slope/intercept/r2.
    val x = 100000007L
    val df = (1 to 5).map(i => ("g", x, i.toDouble)).toDF("grp", "x", "y")
    val r = Regression.groupedOls(df, "grp", col("x"), col("y")).head()
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4),
      s"constant-x group must null out: got $r")
  }

  test("constant-y null contract survives double cancellation error") {
    // y-side analogue of the constant-x test, at the TOP of the operator's
    // documented |ys| < 3e9 domain (per-row ys² must fit a Long on BOTH
    // engines — DuckDB's BIGINT ys·ys raises past that too): ys = 3e9
    // constant over 1000 rows puts sy² ≈ 9e24 and n·syy ≈ 9e24 far past
    // 2⁵³, so the DOUBLE deny cancellation is garbage — the exact
    // min==max test must still null r2 and keep the slope (x varies).
    // The round-12 rework swapped the DECIMAL(38,0) product test for
    // min/max precisely because the product could ALSO overflow (silent
    // NULL → r2 lost for a varying group) at ≥ 3.3e9 rows/group — a
    // 100 TB-reachable scale no spec can, so the spec pins the mechanism
    // at the domain edge instead.
    val df = spark.range(0, 1000)
      .selectExpr("'g' AS grp", "id AS x", "3.0e3 AS y")
    val r = Regression.groupedOls(df, "grp", col("x"), col("y")).head()
    assert(!r.isNullAt(2) && r.getDouble(2) == 0.0,
      s"constant-y slope must be exactly 0: got $r")
    assert(r.getDouble(3) == 3000.0, s"intercept must be the constant: got $r")
    assert(r.isNullAt(4), s"constant-y r2 must be null: got $r")
  }
}
