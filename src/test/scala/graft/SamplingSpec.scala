package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling
import graft.functions.Hashing

/** Deterministic sampling: membership is a pure function of the key,
  * strata get their configured fractions, absent strata fall back.
  */
class SamplingSpec extends SparkSuite {
  import spark.implicits._

  private val rows = (1L to 400L).map(i => (i, if (i % 2 == 0) "en" else "xx"))
    .toDF("id", "lang")

  test("stratified keeps exactly the rows whose key hash clears the stratum fraction") {
    val fractions = Seq(("en", 0.2)).toDF("lang", "fraction")
    val kept = Sampling.stratified(rows, "lang", fractions, col("id"), "s1", 0.7)
      .select("id").as[Long].collect().toSet
    val expected = (1L to 400L).filter { i =>
      val frac = if (i % 2 == 0) 0.2 else 0.7
      Hashing.hash60Jvm(i.toString, "s1").toDouble / 1152921504606846976.0 < frac
    }.toSet
    assert(kept == expected)
    // and the fractions actually bite: en ≈ 20% of 200, xx ≈ 70% of 200
    val en = kept.count(_ % 2 == 0)
    val xx = kept.size - en
    assert(en > 20 && en < 60, s"en kept $en of 200")
    assert(xx > 110 && xx < 170, s"xx kept $xx of 200")
  }

  test("hashSample is repartition-invariant (pure function of the key)") {
    val a = Sampling.hashSample(rows, col("id"), "s2", lit(0.3))
      .select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(rows.repartition(7), col("id"), "s2", lit(0.3))
      .select("id").as[Long].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("prioritySample selects the k largest w/u priorities per group, repartition-invariant") {
    val weighted = (1L to 300L)
      .map(i => (i, if (i % 2 == 0) "en" else "xx", (i % 17 + 1).toDouble))
      .toDF("id", "lang", "w")
    def jvmPriority(i: Long): Double =
      (i % 17 + 1).toDouble * 1152921504606846976.0 /
        (Hashing.hash60Jvm(i.toString, "pr1") + 1).toDouble
    val expected = (1L to 300L).groupBy(i => if (i % 2 == 0) "en" else "xx")
      .flatMap { case (_, ids) =>
        ids.sortBy(i => (-jvmPriority(i), i)).take(10)
      }.toSet
    val got = Sampling.prioritySample(weighted, col("id"), col("w"), "pr1",
        10, Seq("lang"))
      .select("id").as[Long].collect().toSet
    assert(got == expected)
    val reparted = Sampling.prioritySample(weighted.repartition(7), col("id"),
        col("w"), "pr1", 10, Seq("lang"))
      .select("id").as[Long].collect().toSet
    assert(reparted == expected)
  }

  test("prioritySample favors heavy rows: inclusion rate rises with weight") {
    val skewed = (1L to 1000L).map(i => (i, if (i <= 500) 1.0 else 100.0))
      .toDF("id", "w")
    val kept = Sampling.prioritySample(skewed, col("id"), col("w"), "pr2",
        100, Seq.empty)
      .select("id").as[Long].collect()
    val heavy = kept.count(_ > 500)
    assert(heavy > 80, s"heavy rows in sample: $heavy of 100")
  }

  test("malformed fractions frame is rejected") {
    val bad = Seq(("en", 0.2, 1)).toDF("lang", "fraction", "extra")
    intercept[IllegalArgumentException] {
      Sampling.stratified(rows, "lang", bad, col("id"), "s1", 0.5)
    }
  }

  test("unimaxAlloc: caps small groups, water-fills the rest, conserves budget") {
    // tokens: a=100, b=1000, c=10000; budget 6000, cap 2
    // asc order a,b,c: a → min(200, 6000/3=2000) = 200, rem 5800
    //                  b → min(2000, 5800/2=2900) = 2000, rem 3800
    //                  c → min(20000, 3800/1) = 3800, rem 0
    val df = (Seq.fill(100)("a") ++ Seq.fill(1000)("b") ++ Seq.fill(10000)("c"))
      .zipWithIndex.map { case (g, i) => (g, i.toLong) }.toDF("grp", "id")
    val out = graft.ops.Sampling.unimaxAlloc(df, "grp", lit(1L), 6000L, 2)
      .orderBy("grp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      ("a", 100L, 200L, 2.0), ("b", 1000L, 2000L, 2.0), ("c", 10000L, 3800L, 0.38)))
    assert(out.map(_._3).sum === 6000L)
    // under-subscribed: everyone hits the cap, budget left over
    val out2 = graft.ops.Sampling.unimaxAlloc(df, "grp", lit(1L), 50000L, 2)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out2 === Map("a" -> 200L, "b" -> 2000L, "c" -> 20000L))
  }

  test("epochUpsample: floor copies plus hash-decided fractional copy, map-only") {
    val docs = (1L to 400L).map(i => (i, if (i <= 200) 2.5 else 0.25))
      .toDF("id", "epochs")
    val out = graft.ops.Curation.epochUpsample(docs, "id", col("epochs"), "s1")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val counts = out.groupBy(_._1).view.mapValues(_.length).toMap
    // epochs=2.5: every doc 2 or 3 copies; epochs=0.25: 0 or 1
    (1L to 200L).foreach(i => assert(counts(i) == 2 || counts(i) == 3))
    (201L to 400L).foreach(i => assert(counts.getOrElse(i, 0) <= 1))
    // realized copies match the hash decision exactly
    (1L to 400L).foreach { i =>
      val u = graft.functions.Hashing.hash60Jvm(i.toString, "s1").toDouble /
        1152921504606846976.0
      val eps = if (i <= 200) 2.5 else 0.25
      val expect = eps.toLong + (if (u < eps - eps.floor) 1 else 0)
      assert(counts.getOrElse(i, 0) === expect, s"id $i")
    }
    // copy indexes are 1..n per doc
    assert(out.filter(_._1 == 1L).map(_._2).sorted.toSeq ===
      (1L to counts(1L)).toSeq)
    // law of large numbers sanity: fractional realization near 25%
    val fracHits = (201L to 400L).count(i => counts.getOrElse(i, 0) == 1)
    assert(fracHits > 25 && fracHits < 75)
  }

  test("epochUpsample amplification cap: a corrupt epochs value refuses loudly") {
    // round-13 RangeJoin-pattern cap: epochs=1e9 from a bad upstream join
    // would silently explode one row into a cluster-killer
    val docs = Seq((1L, 2.0), (2L, 1.0e9)).toDF("id", "epochs")
    val e = intercept[Exception] {
      graft.ops.Curation.epochUpsample(docs, "id", col("epochs"), "s1").count()
    }
    val msg = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .take(10).flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(msg.contains("maxCopies"), msg)
    // override admits large fan-out when the caller owns it
    val n = graft.ops.Curation.epochUpsample(
      Seq((1L, 20000.0)).toDF("id", "epochs"), "id", col("epochs"), "s1",
      maxCopies = 50000L).count()
    assert(n >= 20000L && n <= 20001L)
  }

  test("epochShuffle is a permutation matching the sequential hash order, stable under repartition") {
    val ids = (1L to 500L).toDF("id")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.epochShuffle(df, col("id"), "ep_t", 4)
        .select("id", "pos", "shard")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val out = run(ids)
    // positions are exactly 0..499 (a permutation)
    assert(out.map(_._2).sorted.toSeq == (0L until 500L))
    assert(out.forall { case (_, p, s) => s == p % 4 })
    // sequential oracle: rank by (hash60, id)
    val hashes = ids.select(col("id"),
        Hashing.hash60(col("id").cast("string"), "ep_t").as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = hashes.sortBy { case (id, h) => (h, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> i.toLong }.toMap
    assert(out.map(t => t._1 -> t._2).toMap == expected)
    // partitioning must not change the permutation
    assert(run(ids.repartition(13)).map(t => t._1 -> t._2).toMap == expected)
    // a different seed re-deals the order
    val re = Sampling.epochShuffle(ids, col("id"), "ep_u", 4)
      .select("id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re != expected)
  }
}
