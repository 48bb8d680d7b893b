package graft

import graft.ops.KCore

/** k-core peeling vs the peel-to-fixed-point reference. */
class KCoreSpec extends SparkSuite {
  import spark.implicits._

  // 5-clique (4-core) + a tail path + a triangle hanging off the clique
  private val g: Seq[(Long, Long)] = {
    val clique = for { i <- 0L to 4L; j <- (i + 1) to 4L } yield (i, j)
    clique ++ Seq((4L, 10L), (10L, 11L), (11L, 12L), (0L, 20L), (20L, 21L), (21L, 0L))
  }

  test("converged peeling equals the fixed-point reference") {
    for (k <- 2 to 5) {
      val got = KCore.run(g.toDF("src", "dst"), "src", "dst", k, rounds = 10)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === KCore.runRef(g, k), s"k=$k")
    }
  }

  test("4-core isolates the clique; 2-core keeps clique + triangle") {
    val c4 = KCore.run(g.toDF("src", "dst"), "src", "dst", 4, 10)
      .collect().map(_.getLong(0)).toSet
    assert(c4 === (0L to 4L).toSet)
    val c2 = KCore.run(g.toDF("src", "dst"), "src", "dst", 2, 10)
      .collect().map(_.getLong(0)).toSet
    assert(c2 === (0L to 4L).toSet ++ Set(20L, 21L))
  }

  test("cascade: peeling one layer exposes the next") {
    // path 0-1-2-3-4: k=2 peels endpoints first, then cascades to empty
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    val got = KCore.run(path.toDF("src", "dst"), "src", "dst", 2, 10)
      .collect()
    assert(got.isEmpty)
    assert(KCore.runRef(path, 2) === Map.empty)
  }

  test("repartition-invariant") {
    val a = KCore.run(g.toDF("src", "dst"), "src", "dst", 3, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = KCore.run(g.toDF("src", "dst").repartition(7), "src", "dst", 3, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }
}
