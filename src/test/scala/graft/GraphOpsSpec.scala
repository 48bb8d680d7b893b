package graft

import graft.ops.{LabelProp, Triangles}

/** Label propagation and triangle counting vs in-memory references,
  * including randomized graphs and repartition invariance.
  */
class GraphOpsSpec extends SparkSuite {
  import spark.implicits._

  // two 4-cliques bridged by one edge, plus a detached path
  private val cliques: Seq[(Long, Long)] = {
    val a = for { i <- 0L to 3L; j <- (i + 1) to 3L } yield (i, j)
    val b = for { i <- 10L to 13L; j <- (i + 1) to 13L } yield (i, j)
    a ++ b ++ Seq((3L, 10L), (20L, 21L), (21L, 22L))
  }

  private def randomGraph(seed: Int, n: Int, m: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (1 to m).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(e => e._1 != e._2)
  }

  test("label propagation equals the synchronous min-tiebreak reference") {
    for (rounds <- Seq(1, 3, 4)) {
      val got = LabelProp.run(cliques.toDF("src", "dst"), "src", "dst", rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === LabelProp.runRef(cliques, rounds), s"rounds=$rounds")
    }
  }

  test("label propagation on random graphs, repartition-invariant") {
    for (seed <- 1 to 3) {
      val g = randomGraph(seed, 30, 120)
      val got = LabelProp.run(g.toDF("src", "dst").repartition(7), "src", "dst", 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === LabelProp.runRef(g, 3), s"seed=$seed")
    }
  }

  test("cliques converge to one community per clique") {
    val got = LabelProp.run(cliques.toDF("src", "dst"), "src", "dst", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // within each 4-clique every node sees the same neighbor multiset
    // modulo itself; with min-tiebreak they collapse onto a single label
    assert((0L to 3L).map(got).toSet.size === 1)
    assert((10L to 13L).map(got).toSet.size === 1)
  }

  test("triangle counts equal the exhaustive reference") {
    val got = Triangles.perNode(cliques.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Triangles.perNodeRef(cliques)
    assert(got === want)
    // a 4-clique corner sits in C(3,2) = 3 triangles
    assert(got(0L) === 3L)
    assert(got(20L) === 0L) // path node: no triangles
  }

  test("triangle counts on random graphs") {
    for (seed <- 1 to 3) {
      val g = randomGraph(seed, 25, 150)
      val got = Triangles.perNode(g.toDF("src", "dst").repartition(5), "src", "dst")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === Triangles.perNodeRef(g), s"seed=$seed")
    }
  }
}
