package graft

import graft.ops.PageRank

/** Integer PageRank: distributed result equals the in-memory reference,
  * is repartition-invariant, and ranks hubs above leaves.
  */
class PageRankSpec extends SparkSuite {
  import spark.implicits._

  // star: hub 0 ↔ leaves 1..5, plus a detached pair 10 ↔ 11
  private val star: Seq[(Long, Long)] =
    (1L to 5L).flatMap(l => Seq((0L, l), (l, 0L))) ++ Seq((10L, 11L), (11L, 10L))

  test("distributed ranks equal the in-memory reference bit-for-bit") {
    val got = PageRank.run(star.toDF("src", "dst"), "src", "dst", iters = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = PageRank.runRef(star, iters = 6)
    assert(got === want)
  }

  test("ranks are repartition-invariant (exact integer mass)") {
    val df1 = star.toDF("src", "dst")
    val df2 = star.toDF("src", "dst").repartition(13)
    val r1 = PageRank.run(df1, "src", "dst", 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r2 = PageRank.run(df2, "src", "dst", 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 === r2)
  }

  test("zero-in-degree nodes stay at base rank and keep contributing (runRef parity)") {
    // 9 → 0 → 1 → 0: node 9 has out-edges but NO in-edges. It must appear
    // in every round's rank table at base rank (not vanish after round 1)
    // and its contribution must keep flowing into 0 — exactly runRef.
    // dst set {0, 1} ⊆ src set {9, 0, 1}: no dangling, but 9 has in-degree 0
    val edges = Seq((9L, 0L), (0L, 1L), (1L, 0L))
    val got = PageRank.run(edges.toDF("src", "dst"), "src", "dst", iters = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = PageRank.runRef(edges, iters = 6)
    assert(got === want)
    assert(got.contains(9L), "zero-in-degree node missing from output")
    val n = 3L
    val base = (PageRank.Scale * 3L / 20L) / n
    assert(got(9L) === base)
  }

  test("a dangling destination (in-edges, no out-edges) fails loudly") {
    val dangling = Seq((0L, 1L), (1L, 2L)) // 2 never appears as src
    val e = intercept[IllegalArgumentException] {
      PageRank.run(dangling.toDF("src", "dst"), "src", "dst", iters = 3)
    }
    assert(e.getMessage.contains("out-edges"))
  }

  test("the hub outranks every leaf; mass is conserved within floor loss") {
    val ranks = PageRank.runRef(star, iters = 8)
    assert((1L to 5L).forall(l => ranks(0L) > ranks(l)))
    val total = ranks.values.sum
    // floors only ever DROP mass: total ≤ Scale, and stays within 1% here
    assert(total <= PageRank.Scale)
    assert(total > PageRank.Scale * 99L / 100L)
  }
}
