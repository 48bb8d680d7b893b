package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Iterative graph analytics over the part↔supplier bipartite graph. */
object GraphQueries {

  private val Iters = 6

  /** Deterministic integer PageRank, `Iters` fixed iterations. The oracle
    * unrolls the same iterations as chained CTEs (recursive CTEs cannot
    * aggregate per step) with identical integer arithmetic, so the ranks
    * hash-match exactly.
    */
  val q76PageRank: Q = {
    val S = graft.ops.PageRank.Scale
    val head =
      s"""WITH edges AS (
         |  SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem
         |  UNION
         |  SELECT l_suppkey * 2 + 1, l_partkey * 2 FROM lineitem
         |), deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
         |ed AS (SELECT e.src, e.dst, deg.d FROM edges e JOIN deg USING (src)),
         |nodes AS (SELECT DISTINCT src AS v FROM edges),
         |consts AS (SELECT CAST($S AS BIGINT) // count(*) AS init,
         |                  (CAST($S AS BIGINT) * 3 // 20) // count(*) AS b FROM nodes),
         |pr0 AS (SELECT v, init AS r FROM nodes CROSS JOIN consts)""".stripMargin
    val steps = (1 to Iters).map { i =>
      s"""pr$i AS (
         |  SELECT ed.dst AS v, consts.b + (17 * sum(p.r // ed.d)) // 20 AS r
         |  FROM ed JOIN pr${i - 1} p ON p.v = ed.src CROSS JOIN consts
         |  GROUP BY ed.dst, consts.b)""".stripMargin
    }
    val sql =
      (head +: steps).mkString(",\n") +
        s"\nSELECT v AS node_id, CAST(r AS BIGINT) AS rank_scaled FROM pr$Iters ORDER BY node_id"

    Q("q76_pagerank", sql) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val fwd = li.select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      val rev = li.select((col("l_suppkey") * 2 + 1).as("src"), (col("l_partkey") * 2).as("dst"))
      graft.ops.PageRank.run(fwd.unionByName(rev), "src", "dst", Iters)
        .orderBy("node_id")
    }
  }

  val all: Seq[Q] = Seq(q76PageRank)
}
