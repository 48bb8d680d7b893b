package graft

import graft.functions.Hashing
import graft.ops.RandomWalk

/** Deterministic walks vs a sequential replay of the same hash rule. */
class RandomWalkSpec extends SparkSuite {
  import spark.implicits._

  private val g: Seq[(Long, Long)] =
    Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))

  private def ref(edges: Seq[(Long, Long)], steps: Int): Map[(Long, Int), Long] = {
    val und = (edges ++ edges.map(_.swap)).filter(e => e._1 != e._2).distinct
    val adj = und.groupBy(_._1).map { case (v, ns) => v -> ns.map(_._2).sorted }
    adj.keys.flatMap { start =>
      var cur = start
      ((start, 0) -> cur) +: (1 to steps).map { t =>
        val ns = adj(cur)
        cur = ns((Hashing.hash60Jvm(s"$start:$t", "rw") % ns.size).toInt)
        (start, t) -> cur
      }
    }.toMap
  }

  test("walks equal the sequential hash-rule replay") {
    val got = RandomWalk.walks(g.toDF("src", "dst"), "src", "dst", steps = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got === ref(g, 5))
  }

  test("walks never leave the component and visit only neighbors") {
    val byWalk = RandomWalk.walks(g.toDF("src", "dst"), "src", "dst", steps = 6)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)
    val und = (g ++ g.map(_.swap)).toSet
    byWalk.foreach { case (walk, rows) =>
      val path = rows.sortBy(_._2).map(_._3)
      assert(path.head === walk)
      path.sliding(2).foreach { case Array(a, b) =>
        assert(und((a, b)), s"walk $walk stepped $a -> $b: not an edge")
      }
    }
    // detached pair stays in its component
    val p10 = byWalk(10L).sortBy(_._2).map(_._3)
    assert(p10.toSet.subsetOf(Set(10L, 11L)))
  }

  test("repartition-invariant") {
    val a = RandomWalk.walks(g.toDF("src", "dst"), "src", "dst", 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = RandomWalk.walks(g.toDF("src", "dst").repartition(5), "src", "dst", 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a === b)
  }
}
