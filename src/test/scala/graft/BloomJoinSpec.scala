package graft

import org.apache.spark.sql.functions._
import graft.ops.BloomJoin

class BloomJoinSpec extends SparkSuite {
  import spark.implicits._

  test("semiJoin equals the exact semi-join") {
    val big = (1L to 10000L).map(i => (i, i % 97)).toDF("id", "key")
    val keys = Seq(3L, 17L, 42L, 96L).toDF("k")
    val got = BloomJoin.semiJoin(big, col("key"), keys, col("k"))
      .select("id").as[Long].collect().sorted
    val want = big.join(keys, col("key") === col("k"), "left_semi")
      .select("id").as[Long].collect().sorted
    assert(got.sameElements(want) && want.nonEmpty)
  }

  test("empty key set yields an empty result with the big schema") {
    val big = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val keys = Seq.empty[Long].toDF("k")
    val out = BloomJoin.semiJoin(big, col("id"), keys, col("k"))
    assert(out.schema == big.schema && out.count() == 0)
  }

  test("sketch prunes most non-members and admits every member") {
    val keys = (1L to 500L).map(_ * 1000).toDF("k")
    val sketch = BloomJoin.buildSketch(keys, col("k"), 500, 0.01).get
    val probe = (1L to 100000L).toDF("x")
    val admitted = probe.where(BloomJoin.mightContain(sketch, col("x"))).count()
    // all 100 true members of the probe range pass; fp rate ~1% of the rest
    assert(admitted >= 100)
    assert(admitted <= 100 + 3000, s"bloom admitted $admitted — fpp far above 1%")
  }

  test("null probe keys never survive the residual join") {
    val big = Seq(Some(1L), None, Some(2L)).toDF("key")
    val keys = Seq(1L).toDF("k")
    val out = BloomJoin.semiJoin(big, col("key"), keys, col("k"))
      .as[Option[Long]].collect()
    assert(out.toSeq == Seq(Some(1L)))
  }

  test("antiJoin equals the exact anti-join, including null probe keys") {
    val big = (Seq(Some(1L), None) ++ (2L to 5000L).map(Some(_)))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "key")
    val keys = Seq(3L, 17L, 42L, 4999L).toDF("k")
    val got = BloomJoin.antiJoin(big, col("key"), keys, col("k"))
      .select("id").as[Long].collect().sorted
    val want = big.join(keys, col("key") === col("k"), "left_anti")
      .select("id").as[Long].collect().sorted
    assert(got.sameElements(want))
    // null-key row survives exactly once
    assert(got.length == big.count() - 4)
  }

  test("antiJoin with an empty key set keeps every row") {
    val big = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val keys = Seq.empty[Long].toDF("k")
    assert(BloomJoin.antiJoin(big, col("id"), keys, col("k")).count() == 2)
  }

  test("buildSketch rejects bad parameters") {
    val keys = Seq(1L).toDF("k")
    intercept[IllegalArgumentException](BloomJoin.buildSketch(keys, col("k"), 0, 0.01))
    intercept[IllegalArgumentException](BloomJoin.buildSketch(keys, col("k"), 10, 1.5))
  }
}
