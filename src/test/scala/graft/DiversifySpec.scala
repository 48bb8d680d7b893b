package graft

import graft.ops.Diversify

/** MMR greedy trace against a JVM replay of the same rounded-cosine
  * contract, plus the shape property the op exists for: the second pick
  * avoids a near-duplicate of the first even when it is the
  * second-most-relevant candidate.
  */
class DiversifySpec extends SparkSuite {

  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    val sa = a.map(x => math.round(x * 1e6))
    val sb = b.map(x => math.round(x * 1e6))
    val dot = sa.zip(sb).map { case (x, y) => x * y }.sum.toDouble
    val r = dot / (math.sqrt(sa.map(x => x.toDouble * x).sum) *
      math.sqrt(sb.map(x => x.toDouble * x).sum))
    math.floor(r * 1e6 + 0.5) / 1e6
  }

  private def refMmr(vecs: Map[Long, Seq[Double]], qId: Long, k: Int,
      lam: Double): Seq[Long] = {
    val cands = vecs.keys.filter(_ != qId).toSeq.sorted
    val q = vecs(qId)
    var picked = Vector.empty[Long]
    for (_ <- 1 to k) {
      val best = cands.filterNot(picked.contains).map { id =>
        val sq = cos(vecs(id), q)
        val pen = if (picked.isEmpty) 0.0
          else picked.map(p => cos(vecs(id), vecs(p))).max
        val score = if (picked.isEmpty) sq else sq - lam * pen
        (-score, id)
      }.min._2
      picked = picked :+ best
    }
    picked
  }

  test("mmrTopK matches the JVM replay; λ=1 flips the near-dup second pick") {
    import spark.implicits._
    val vecs: Map[Long, Seq[Double]] = Map(
      0L -> Seq(1.0, 0.0, 0.0),       // query
      1L -> Seq(1.0, 0.1, 0.0),       // most relevant
      2L -> Seq(1.0, 0.1, 0.001),     // near-exact dup of 1 (cos ≈ 1)
      3L -> Seq(0.7, 0.0, 0.7),       // diverse, still relevant
      4L -> Seq(-1.0, 0.0, 0.0))
    val df = vecs.toSeq.map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    for (lam <- Seq(0.0, 0.5, 1.0)) {
      val got = Diversify.mmrTopK(df, "vec_id", "embedding", 0L, 3, lam)
        .orderBy("rank").collect().map(_.getLong(1)).toSeq
      assert(got == refMmr(vecs, 0L, 3, lam), s"lambda=$lam")
      assert(got.head == 1L, "first pick is always the most relevant")
    }
    // λ=0 is pure relevance (near-dup second); λ=1 diversifies it away
    val pure = Diversify.mmrTopK(df, "vec_id", "embedding", 0L, 2, 0.0)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    val div = Diversify.mmrTopK(df, "vec_id", "embedding", 0L, 2, 1.0)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(pure == Seq(1L, 2L))
    assert(div == Seq(1L, 3L),
      "full-strength MMR must skip the near-duplicate of pick 1")
  }

  test("k = candidate count returns every candidate exactly once") {
    import spark.implicits._
    val df = (0L to 4L).map(i => (i, Seq(i.toFloat, 1f)))
      .toDF("vec_id", "embedding")
    val got = Diversify.mmrTopK(df, "vec_id", "embedding", 0L, 4, 0.5)
      .collect().map(_.getLong(1)).toSet
    assert(got == Set(1L, 2L, 3L, 4L))
  }

  test("poolCap: non-binding cap is a no-op; binding cap keeps top relevance") {
    import spark.implicits._
    // 20 candidates on distinct rays → distinct query similarities
    val df = (0L to 20L).map(i => (i, Seq(100f, i.toFloat)))
      .toDF("vec_id", "embedding")
    val full = Diversify.mmrTopK(df, "vec_id", "embedding", 0L, 3, 0.5)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    val capped = Diversify.mmrTopK(df, "vec_id", "embedding", 0L, 3, 0.5,
      poolCap = 20)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(capped === full, "cap ≥ pool size must not change the trace")
    // binding cap: only the 5 most query-similar candidates (smallest i —
    // closest to the (100, 0) query ray) stay eligible
    val tight = Diversify.mmrTopK(df, "vec_id", "embedding", 0L, 3, 0.5,
      poolCap = 5)
      .orderBy("rank").collect().map(_.getLong(1)).toSet
    assert(tight.subsetOf(Set(1L, 2L, 3L, 4L, 5L)),
      s"capped picks must come from the relevance top-5, got $tight")
    intercept[IllegalArgumentException] {
      Diversify.mmrTopK(df, "vec_id", "embedding", 0L, 6, 0.5, poolCap = 5)
    }
  }

  test("k past the candidate count fails loudly up front, not via NPE") {
    import spark.implicits._
    val df = (0L to 2L).map(i => (i, Seq(i.toFloat, 1f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Diversify.mmrTopK(df, "vec_id", "embedding", 0L, 3, 0.5)
    }
    assert(e.getMessage.contains("exceeds the 2 candidate"))
  }

  test("a query id absent from the corpus fails with a clear message") {
    import spark.implicits._
    val df = (0L to 2L).map(i => (i, Seq(i.toFloat, 1f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Diversify.mmrTopK(df, "vec_id", "embedding", 99L, 1, 0.5)
    }
    assert(e.getMessage.contains("query id 99 not found"))
  }
}
