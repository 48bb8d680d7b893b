package graft

import org.apache.spark.sql.functions._
import graft.ops.{RankTest, TimeSeries}

class CusumRankSpec extends SparkSuite {

  test("cusum closed form equals the recursive clamp, alarms fire correctly") {
    import spark.implicits._
    // a level shift at period 6: counts double
    val series = Seq(10L, 11L, 9L, 10L, 10L, 22L, 21L, 23L, 22L, 22L)
    val df = series.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("p", "n")
    val got = TimeSeries.cusum(df, "p", "n", 1, 20)
      .orderBy("p").collect()
      .map(r => (r.getLong(2), r.getLong(3)))
    // recursive reference at the same D scale
    val d = series.size
    val total = series.sum
    var s = 0L
    val expected = series.map { n =>
      s = math.max(0L, s + (n * d - total))
      (s, if (s * 20 > total * d * 1) 1L else 0L)
    }
    assert(got.toSeq == expected)
    assert(expected.last._2 == 1L, "the shifted tail must alarm")
    assert(expected.head._2 == 0L, "the stable head must not")
  }

  test("mannWhitney matches a JVM replay with ties; identical samples give z = 0") {
    import spark.implicits._
    val a = Seq(1.0, 2.0, 2.0, 3.0, 5.0, 5.0, 8.0)
    val b = Seq(2.0, 4.0, 5.0, 6.0, 6.0)
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")
    val r = RankTest.mannWhitney(df, col("v"), col("g") === "a").head()
    // doubled-scale rank reference
    val all = (a ++ b).sorted
    def avgRankX2(v: Double): Long = {
      val first = all.indexOf(v); val t = all.count(_ == v)
      2L * first + t + 1
    }
    val r1x2 = a.map(avgRankX2).sum
    val (n1, n2) = (a.size.toLong, b.size.toLong)
    val u1x2 = r1x2 - n1 * (n1 + 1)
    assert(r.getLong(0) == n1 && r.getLong(1) == n2 && r.getLong(2) == u1x2)
    val n = (n1 + n2).toDouble
    val ties = all.distinct.map(v => all.count(_ == v).toLong)
      .map(t => t * t * t - t).sum
    val varU = n1 * n2 / 12.0 * ((n + 1.0) - ties / (n * (n - 1.0)))
    val z = (u1x2 - n1.toDouble * n2) / (2.0 * math.sqrt(varU))
    assert(r.getDouble(3) == math.floor(z * 1e6 + 0.5) / 1e6)
    // symmetric input → U₁ = n₁n₂/2 exactly, z = 0
    val sym = (a.map(("a", _)) ++ a.map(("b", _))).toDF("g", "v")
    val rs = RankTest.mannWhitney(sym, col("v"), col("g") === "a").head()
    assert(rs.getLong(2) == a.size.toLong * a.size)
    assert(rs.getDouble(3) == 0.0)
  }

  test("mannWhitney: undefined test reports NULL z, never an ANSI raise") {
    import spark.implicits._
    // n = 1 (one group empty): the tie-correction divisor n(n-1) is 0 —
    // the round-12 shrunk property case that raised DIVIDE_BY_ZERO under
    // ANSI (Spark 4 raises for DOUBLE division too, so the old "0/0 = NaN
    // identically on both engines" comment was wrong)
    val one = Seq(("b", 0.0)).toDF("g", "v")
    val r1 = RankTest.mannWhitney(one, col("v"), col("g") === "a").head()
    assert(r1.getLong(0) == 0L && r1.getLong(1) == 1L && r1.isNullAt(3),
      s"n=1 must give NULL z: got $r1")
    // every value tied: tie-corrected variance is exactly 0 — undefined
    val tied = (1 to 6).map(i => (if (i % 2 == 0) "a" else "b", 7.0))
      .toDF("g", "v")
    val rt = RankTest.mannWhitney(tied, col("v"), col("g") === "a").head()
    assert(rt.getLong(0) == 3L && rt.getLong(1) == 3L && rt.isNullAt(3),
      s"all-tied must give NULL z: got $rt")
  }

  test("mannWhitney: all-tied NULL z holds past 2^53 tie-term precision (exact gate)") {
    // t³−t > 2⁵³ needs t ≳ 2.1e5: at that size double(ties)/(n(n−1))
    // no longer divides exactly to n+1, so a variance-only guard leaks a
    // tiny nonzero variance and a huge finite z (round-12 advice). The
    // gate is now the EXACT condition — one distinct value row — which a
    // row count detects at any scale.
    val n = 260000
    val big = spark.range(n)
      .select(col("id"), org.apache.spark.sql.functions.lit(42.0).as("v"))
    val rb = RankTest.mannWhitney(big, col("v"), col("id") % 2 === 0).head()
    assert(rb.getLong(0) == (n / 2).toLong && rb.getLong(1) == (n / 2).toLong)
    assert(rb.isNullAt(3),
      s"all-tied at n=$n must give NULL z (exact one-distinct-value gate), got $rb")
  }

  test("mannWhitneyZ agrees with the exact form's z on the gate domain; degenerates stay NULL") {
    // round-15 (the q218 waiver's documented remedy): same IEEE z over the
    // same exact integers — DECIMAL(38,0) vs Long only changes headroom,
    // so on any in-wall input the two z values are bit-equal
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0 until 400).map(i =>
      (if (rnd.nextBoolean()) "a" else "b",
        rnd.nextInt(25).toDouble)) // heavy ties
    val df = rows.toDF("g", "v")
    val exact = RankTest.mannWhitney(df, col("v"), col("g") === "a").head()
    val zOnly = RankTest.mannWhitneyZ(df, col("v"), col("g") === "a").head()
    assert(zOnly.getLong(0) == exact.getLong(0) &&
      zOnly.getLong(1) == exact.getLong(1))
    assert(zOnly.getDouble(2) == exact.getDouble(3), s"$zOnly vs $exact")
    // degenerate contracts carry over: all-tied → NULL z
    val tied = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0)).toDF("g", "v")
    assert(RankTest.mannWhitneyZ(tied, col("v"), col("g") === "a")
      .head().isNullAt(2))
  }

  test("mannWhitneyZ lifts the exact form's Long wall: billion-count ranks stay finite") {
    // probe the documented ~2–3e9-event wall WITHOUT 2e9 rows: feed the
    // shared value-distinct seam (rankedCounts' schema) synthetic counts
    // whose exact-Long term c1·(2·prior+t+1) overflows 2⁶³ — the exact
    // form raises the NAMED ANSI overflow (loud, the r13 contract), the
    // decimal form returns the finite, well-scaled z
    import spark.implicits._
    val c = 2000000000L // 2e9 per value → prior up to 1.2e10
    // _prior is the PLAIN exclusive count of earlier rows (doubling
    // happens inside the term): 0, t, 2t
    val ranked = Seq(
      (1.0, c, c, 2 * c, 0L),
      (2.0, c, c, 2 * c, 2 * c),
      (3.0, c, c, 2 * c, 4 * c))
      .toDF("v", "c1", "c2", "t", "_prior")
    val loud = intercept[Exception] {
      RankTest.zFromRanked(ranked,
        col("c1") * (col("_prior") * 2 + col("t") + 1),
        keepExactU = true).head()
    }
    val chain = Iterator.iterate[Throwable](loud)(_.getCause)
      .takeWhile(_ != null).take(10)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(chain.contains("OVERFLOW") || chain.contains("overflow"), chain)
    val z = RankTest.zFromRanked(ranked,
      col("c1").cast("decimal(38,0)") *
        (col("_prior").cast("decimal(38,0)") * 2 + col("t") + 1),
      keepExactU = false).head()
    assert(z.getLong(0) == 3 * c && z.getLong(1) == 3 * c)
    // symmetric samples at every value → U₁ = n₁n₂/2 exactly → z = 0
    assert(z.getDouble(2) == 0.0, z.toString)
  }
}
