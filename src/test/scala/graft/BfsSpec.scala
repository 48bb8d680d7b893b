package graft

import graft.ops.Bfs

/** Frontier-delta BFS vs the sequential reference: multi-source min,
  * early drain, unreached exclusion.
  */
class BfsSpec extends SparkSuite {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], sources: Set[Long],
      hops: Int): Map[Long, Long] =
    Bfs.distances(edges.toDF("src", "dst"), "src", "dst",
        sources.toSeq.toDF("v"), hops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain with two sources: min distance wins, cap respected") {
    // 1-2-3-4-5-6-7, sources {1, 7}
    val chain = (1L to 6L).map(i => (i, i + 1))
    val got = run(chain, Set(1L, 7L), 2)
    assert(got === Map(1L -> 0L, 7L -> 0L, 2L -> 1L, 6L -> 1L,
      3L -> 2L, 5L -> 2L)) // 4 is 3 hops from both: excluded at cap 2
    assert(got === Bfs.distancesRef(chain, Set(1L, 7L), 2))
  }

  test("disconnected component never appears; early-drain terminates") {
    val edges = Seq((1L, 2L), (10L, 11L))
    val got = run(edges, Set(1L), 5) // frontier drains after round 1
    assert(got === Map(1L -> 0L, 2L -> 1L))
    assert(got === Bfs.distancesRef(edges, Set(1L), 5))
  }
}
