package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Per-node triangle counting with degree-ordered orientation (the
  * MapReduce-clique-counting construction of Suri & Vassilvitskii, WWW'11):
  * orient every undirected edge from the endpoint with the smaller
  * (degree, id) toward the larger, enumerate wedges by self-joining the
  * oriented list on its source, and close each wedge with one more
  * equi-join. Orientation bounds every node's out-degree at O(√m), so the
  * wedge table is O(m^{3/2}) WORST-case — the best possible for exact
  * triangle counting — and each triangle is generated exactly once (from
  * its smallest-ranked vertex).
  *
  * Every step is an equi-join or a map-side-combined aggregation; nothing
  * is quadratic in a hub node's degree, which is the failure mode of the
  * naive adjacency self-join on skewed (power-law) graphs at 100 TB.
  */
object Triangles {

  /** Count triangles per node over an undirected graph given as a directed
    * edge list (symmetrized + dedup'd internally; self-loops dropped).
    * Returns (node_id, n_triangles) for every node incident to an edge —
    * zero-triangle nodes included.
    *
    * `canonical = true` asserts the input is already a DISTINCT src<dst
    * pair list (the [[Cooccur.coedges]] contract): the symmetrized union
    * is then distinct by construction (the two halves are disjoint) and
    * the graph-sized distinct shuffle is skipped.
    */
  def perNode(edgesDf: DataFrame, srcCol: String, dstCol: String,
      canonical: Boolean = false): DataFrame = {
    val dir = edgesDf.select(
      col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    val sym = dir
      .unionByName(dir.select(col("dst").as("src"), col("src").as("dst")))
    val und = (if (canonical) sym
               else sym.where(col("src") =!= col("dst")).distinct())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = und.groupBy(col("src").as("v")).agg(count(lit(1)).as("d"))
    // oriented: keep (u, w) iff (deg(u), u) < (deg(w), w)
    val oriented = und
      .join(deg.select(col("v").as("src"), col("d").as("ds")), "src")
      .join(deg.select(col("v").as("dst"), col("d").as("dd")), "dst")
      .where(struct(col("ds"), col("src")) < struct(col("dd"), col("dst")))
      .select(col("src").as("u"), col("dst").as("w"),
        struct(col("dd"), col("dst")).as("rank_w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // wedges from u: unordered out-neighbor pairs {v, w}, emitted once in
    // rank order (rank(v) < rank(w)); the closing edge, if the triangle
    // exists, is then oriented v→w, so ONE equi-join on (v, w) closes each
    // triangle exactly once.
    val wedges = oriented
      .select(col("u"), col("w").as("v"), col("rank_w").as("rank_v"))
      .join(oriented.select(col("u"), col("w"), col("rank_w")), "u")
      .where(col("rank_v") < col("rank_w"))
      .select(col("u"), col("v"), col("w"))
    val tri = wedges
      .join(oriented.select(col("u").as("v"), col("w")), Seq("v", "w"))
      .select(col("u"), col("v"), col("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // each triangle (u, v, w) credits all three corners
    val credits = tri.select(col("u").as("node_id"))
      .unionAll(tri.select(col("v").as("node_id")))
      .unionAll(tri.select(col("w").as("node_id")))
      .groupBy("node_id").agg(count(lit(1)).as("n_triangles"))
    Pins.sealOutput(
      deg.select(col("v").as("node_id"))
        .join(credits, Seq("node_id"), "left")
        .select(col("node_id"),
          coalesce(col("n_triangles"), lit(0L)).as("n_triangles")),
      und, oriented, tri)
  }

  /** In-memory reference for tests. */
  def perNodeRef(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = (edges ++ edges.map(_.swap)).filter(e => e._1 != e._2).distinct
    val adj = und.groupBy(_._1).map { case (v, g) => v -> g.map(_._2).toSet }
    val nodes = adj.keys.toSeq
    nodes.map { v =>
      val ns = adj(v).toSeq
      val t = (for {
        i <- ns.indices; j <- (i + 1) until ns.size
        if adj(ns(i)).contains(ns(j))
      } yield 1).size
      v -> t.toLong
    }.toMap
  }
}
