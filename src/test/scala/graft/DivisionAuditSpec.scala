package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Boilerplate, CountMin, Curation, Diversify, SlidingAgg}

/** Spec pins for the round-13 ANSI-division audit (PLANS.md "Round 13"
  * inventory): every guard added by the audit, plus the two semantic
  * claims the inventory's bulk verdicts rely on — NULL dividends
  * short-circuit ANSI's divisor check (the empty-global-agg shape), and
  * ANSI really does raise on DOUBLE division (so the guards are load-
  * bearing, not decorative).
  */
class DivisionAuditSpec extends SparkSuite {
  import spark.implicits._

  test("ANSI preconditions: DOUBLE x/0 raises; NULL/0 is NULL (empty-agg shape)") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    // the raise the audit defends against
    intercept[Exception] {
      Seq(1.0).toDF("x").select(col("x") / lit(0.0)).head()
    }
    // NULL dividend short-circuits: sum over an empty global agg is NULL,
    // so NULL / count(*)=0 is NULL, never DIVIDE_BY_ZERO — the verdict
    // behind every per-group average in the inventory's GC≥1 class
    val r = spark.sql(
      "SELECT sum(x) / count(*) AS m, CAST(NULL AS DOUBLE) / 0.0 AS z " +
        "FROM (SELECT 1.0 AS x WHERE false)").head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("exact-sum headroom: BIGINT sum overflow raises loudly under ANSI (never wraps)") {
    // the 100 TB question for the exact-cents discipline: ~1e12 rows of
    // ~1e7-cent values approach 2⁶³. The contract is LOUD-NOT-WRONG —
    // ANSI sum raises ARITHMETIC_OVERFLOW instead of wrapping — and the
    // remedy at the gate that needs it is per-row DECIMAL promotion (the
    // q218 tie-term pattern). Pin the raise so a conf drift that silently
    // re-enables wrapping fails here.
    val e = intercept[Exception] {
      spark.range(3).select(lit(Long.MaxValue / 2).as("x"))
        .agg(sum("x")).head()
    }
    val msg = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .take(10).flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(msg.toLowerCase.contains("overflow"), msg)
  }

  test("domainMixture: zero-token corpus reports NULL mixture, not a raise") {
    val docs = Seq(("a", 0L), ("b", 0L)).toDF("src", "tk")
    val m = Curation.domainMixture(docs, "src", col("tk")).collect()
    assert(m.length == 2)
    m.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("share")), r)
      assert(r.isNullAt(r.fieldIndex("weight")), r)
    }
    // and a normal corpus still sums weights to ~1
    val ok = Curation.domainMixture(
      Seq(("a", 900L), ("b", 100L)).toDF("src", "tk"), "src", col("tk"))
      .collect().map(_.getAs[Double]("weight")).sum
    assert(math.abs(ok - 1.0) < 1e-4, ok)
  }

  test("mixtureSample: undefined mixture samples empty, not a raise") {
    val docs = Seq((1L, "a", 0L), (2L, "b", 0L)).toDF("id", "src", "tk")
    val out = Curation.mixtureSample(docs, "id", "src", col("tk"), "s13")
    assert(out.count() == 0L)
  }

  test("mmrTopK: all-zero query and candidate vectors score cosine 0, not a raise") {
    val zero = Seq.fill(4)(0.0f)
    val v = Seq(1.0f, 0.0f, 0.0f, 0.0f)
    val df = Seq((0L, zero), (1L, v), (2L, zero), (3L, Seq(0f, 1f, 0f, 0f)))
      .toDF("id", "embedding")
    // zero QUERY vector: every similarity 0, still returns k rows
    val r0 = Diversify.mmrTopK(df, "id", "embedding", queryId = 0L,
      k = 2, lambda = 0.5)
    assert(r0.count() == 2L)
    // zero CANDIDATE among normal vectors: guard rides the when(aa > 0)
    val r1 = Diversify.mmrTopK(df, "id", "embedding", queryId = 1L,
      k = 3, lambda = 0.5)
    assert(r1.count() == 3L)
  }

  test("varPopFromSums: n=0 is NULL; constant input past 2^53 clamps to 0, sqrt stays finite") {
    val f = graft.functions.Exact
    // constant value 3e6 over n=200k rows: sum=6e11, sum^2=3.6e23 — far
    // past 2^53, the unclamped radicand rounds to a tiny NEGATIVE
    val n = 200000L
    val v = 3000000L
    val df = Seq((v * n, v * v * n, n), (0L, 0L, 0L)).toDF("s", "sq", "n")
    val rows = df.select(
      f.varPopFromSums(col("s"), col("sq"), col("n")).as("va"),
      f.stddevPopFromSums(col("s"), col("sq"), col("n")).as("sd")).collect()
    val const = rows.head
    assert(const.getDouble(0) == 0.0, s"clamped variance: $const")
    assert(const.getDouble(1) == 0.0)
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1), rows(1).toString)
  }

  test("varPopFromSums: NULL radicand with n>0 stays NULL, never clamps to 0.0") {
    // round-14 advice: greatest() SKIPS NULLs, so an unguarded clamp
    // turned a NULL sum/sumsq with n>0 (all-NULL value column counted via
    // count(*); overflow-degraded sums on a non-ANSI engine) into a
    // silent variance of 0. NULL is the undefined-statistic currency.
    val f = graft.functions.Exact
    val df = Seq[(Option[Long], Option[Long], Long)](
      (None, Some(9L), 3L),      // NULL sum
      (Some(9L), None, 3L),      // NULL sumsq
      (Some(6L), Some(14L), 3L)  // healthy: var = 14/3 - 4 = 2/3
    ).toDF("s", "sq", "n")
    val rows = df.select(
      f.varPopFromSums(col("s"), col("sq"), col("n")).as("va"),
      f.stddevPopFromSums(col("s"), col("sq"), col("n")).as("sd")).collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1), rows(0).toString)
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1), rows(1).toString)
    assert(math.abs(rows(2).getDouble(0) - 2.0 / 3.0) < 1e-12)
  }

  test("embed-dim std radicand clamp: constant dimension at 2^53-breaking scale gives std 0.0") {
    // the q31 shape, distilled: a constant scaled-int column over enough
    // rows that (sum sv)² rounds — unclamped sqrt gives NaN and the exact
    // cast raises on a LEGITIMATE (constant) input. (sv, n) chosen so the
    // IEEE rounding direction is provably negative: sv=999980, n=199993
    // gives radicand ≈ −1.6e-4 (too-round values like 1e6 × 2e5 are
    // exactly representable and land on 0 by luck)
    val d = spark.range(199993).select(lit(999980L).as("sv"))
    val std = d.agg(
      graft.functions.Exact.roundPortable(sqrt(greatest(lit(0.0),
        (sum(col("sv") * col("sv")).cast("double") -
          sum("sv").cast("double") * sum("sv").cast("double") / count(lit(1)))
          / count(lit(1)))) / 1000000.0, 6).as("std")).head().getDouble(0)
    assert(std == 0.0, s"constant dim must have std 0.0, got $std")
    // and the UNclamped radicand really is negative at this scale — the
    // clamp is load-bearing, not decorative
    val raw = d.agg(((sum(col("sv") * col("sv")).cast("double") -
      sum("sv").cast("double") * sum("sv").cast("double") / count(lit(1)))
      / count(lit(1))).as("r")).head().getDouble(0)
    assert(raw < 0.0, s"expected a hair-negative unclamped radicand, got $raw")
  }

  test("parameter-edge requires refuse loudly (width / buckets / sliceUs / targetLen)") {
    val docs = Seq((1L, Seq("a", "b"))).toDF("id", "toks")
    intercept[IllegalArgumentException] {
      Boilerplate.segments(docs, "id", col("toks"), width = 0)
    }
    intercept[IllegalArgumentException] {
      CountMin.bucket(lit("t"), 0, "s", width = 0)
    }
    intercept[IllegalArgumentException] {
      SlidingAgg.trailing(Seq((1L, 0L, 1L)).toDF("k", "ts", "v"),
        "k", col("ts"), col("v"), lookbackUs = 0L, sliceUs = 0L)
    }
    intercept[IllegalArgumentException] {
      graft.ops.Scoring.dsirSelect(
        Seq((1L, true, Seq("a", "b"))).toDF("id", "t", "toks"),
        "id", col("toks"), col("t"), buckets = 0)
    }
  }

  test("resizeFeatures: empty pixel payload yields zero features, not src(-1)") {
    import graft.multimodal.Media
    val decoded = Seq(
      Media.DecodedFrame(0L, 0, 0, 0, Array.empty[Float]),
      Media.DecodedFrame(1L, 0, 2, 1, Array(1.0f, 3.0f))).toDS()
    val out = Media.resizeFeatures(spark, decoded, targetLen = 4)
      .orderBy("media_id").collect()
    assert(out(0).getSeq[Float](2) == Seq(0f, 0f, 0f, 0f))
    assert(out(1).getSeq[Float](2).length == 4)
    intercept[IllegalArgumentException] {
      Media.resizeFeatures(spark, decoded, targetLen = 0)
    }
  }
}
