package graft

import org.apache.spark.sql.functions._
import graft.ops.{Quantiles, Sampling, Sweep}

/** Round-10 ops: interval sweep-line, exact stratified split, weighted
  * median — each against a brute-force replay of its contract.
  */
class SweepSplitMedianSpec extends SparkSuite {

  test("peakConcurrency: half-open boundaries, ties, earliest argmax") {
    import spark.implicits._
    // [0,10) [5,15) [10,20): end-exclusive means 10 is NOT a 3-overlap
    // point (first interval closed); peak 2 first attained at t=5
    val iv = Seq((0L, 10L), (5L, 15L), (10L, 20L)).toDF("s", "e")
    val r = Sweep.peakConcurrency(iv, "s", "e").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 5L)
    // nested intervals: peak 3 at the innermost start
    val iv2 = Seq((0L, 100L), (10L, 90L), (20L, 80L)).toDF("s", "e")
    val r2 = Sweep.peakConcurrency(iv2, "s", "e").head()
    assert(r2.getLong(0) == 3L && r2.getLong(1) == 20L)
    // empty input → (0, null)
    val r3 = Sweep.peakConcurrency(iv.where(lit(false)), "s", "e").head()
    assert(r3.getLong(0) == 0L && r3.isNullAt(1))
  }

  test("peakConcurrency matches a brute-force sweep on pseudo-random intervals") {
    import spark.implicits._
    val ivs = (1 to 200).map { i =>
      val s = (i * 7919) % 500L; (s, s + 1 + (i * 104729) % 60L) }
    val got = Sweep.peakConcurrency(ivs.toDF("s", "e"), "s", "e").head()
    val events = ivs.flatMap { case (s, e) => Seq((s, 1), (e, -1)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy(_._1)
    val sweep = events.scanLeft((Long.MinValue, 0)) {
      case ((_, acc), (t, d)) => (t, acc + d) }.drop(1)
    val peak = sweep.map(_._2).max
    val firstT = sweep.find(_._2 == peak).get._1
    assert(got.getLong(0) == peak.toLong && got.getLong(1) == firstT)
  }

  test("exactStratifiedSplit hits the per-stratum quota exactly") {
    import spark.implicits._
    val df = (0 until 103).map(i => (i.toLong, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "st").repartition(7)
    val out = Sampling.exactStratifiedSplit(df, "st", col("id"), "sp", 4, 5)
    val counts = out.groupBy("st", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // strata: a has 35 rows → train 28; b has 68 → train 54 (floor 0.8n)
    assert(counts(("a", "train")) == 28L && counts(("a", "test")) == 7L)
    assert(counts(("b", "train")) == 54L && counts(("b", "test")) == 14L)
    // matches the windowed replay rank-for-rank
    val h = graft.functions.Hashing
    val byStratum = (0 until 103).map(i =>
      (i.toLong, if (i % 3 == 0) "a" else "b",
        h.hash60Jvm(i.toString, "sp")))
      .groupBy(_._2)
    val expected = byStratum.flatMap { case (st, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._1))
      val k = sorted.size * 4 / 5
      sorted.zipWithIndex.map { case (r, idx) =>
        (r._1, if (idx < k) "train" else "test") }
    }.toMap
    val got = out.collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(got == expected)
  }

  test("weightedMedian: lower median under the 2·cum ≥ total rule") {
    import spark.implicits._
    // g: values 1(w1) 2(w1) 3(w10): total 12, crossing at v=3
    // h: values 5(w2) 7(w2): total 4, crossing at v=5 (2·2 ≥ 4, lower)
    val df = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 10L),
      ("h", 5L, 2L), ("h", 7L, 2L)).toDF("grp", "v", "w")
    val got = Quantiles.weightedMedian(df, "grp", "v", "w")
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("g", 12L, 3L), ("h", 4L, 5L)))
  }
}
