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
