package graft

import graft.ops.PageRank

/** Personalized PageRank against its JVM twin: teleport mass confined to
  * seeds, zero-rank nodes surviving every round.
  */
class PprSpec extends SparkSuite {

  test("personalized matches personalizedRef; non-seed component decays to 0") {
    import spark.implicits._
    // two components: a triangle holding the seed, and a disjoint pair
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (3L, 2L), (2L, 1L),
      (10L, 11L), (11L, 10L))
    val seeds = Seq(1L).toDF("v")
    for (iters <- Seq(1, 3, 5)) {
      val got = PageRank.personalized(edges.toDF("src", "dst"), "src", "dst",
          seeds, iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == PageRank.personalizedRef(edges, Set(1L), iters), s"iters=$iters")
      assert(got(10L) == 0L && got(11L) == 0L,
        "unreachable component must hold zero rank")
    }
  }

  test("a seed outside the graph fails loudly") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      PageRank.personalized(Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"),
        "src", "dst", Seq(99L).toDF("v"), 1)
    }
    assert(e.getMessage.contains("seed"))
  }
}
