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
    * pair list (the [[Cooccur.coedges]] contract), skipping the
    * normalization distinct entirely.
    *
    * The whole pre-wedge phase runs on the CANONICAL m-row pair list — the
    * graph is never symmetrized (round-10: the former 2m-row symmetrize
    * union fed the dedup AND both degree joins at double width; orienting
    * a canonical pair is just a projection choosing which endpoint is u,
    * since both orders are present in the one row). Degrees come from a
    * 2m-row unionAll→groupBy (map-side combined, no join), and
    * non-canonical input normalizes via least/greatest + distinct at m
    * rows instead of 2m.
    */
  def perNode(edgesDf: DataFrame, srcCol: String, dstCol: String,
      canonical: Boolean = false): DataFrame = {
    val dir = edgesDf.select(
      col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    val canon = (if (canonical) dir
                 else dir.where(col("src") =!= col("dst"))
                   .select(least(col("src"), col("dst")).as("src"),
                     greatest(col("src"), col("dst")).as("dst"))
                   .distinct())
      .persist(StorageLevel.MEMORY_AND_DISK)
    // deg(v) = # canonical pairs containing v = undirected degree; persisted
    // because it feeds both orientation joins and the final left join
    val deg = canon.select(col("src").as("v"))
      .unionAll(canon.select(col("dst").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // oriented: u = the smaller-(deg, id) endpoint of each canonical pair,
    // w the larger — a projection, not a filter over a symmetrized table
    val srcFirst = struct(col("ds"), col("src")) < struct(col("dd"), col("dst"))
    val oriented = canon
      .join(deg.select(col("v").as("src"), col("d").as("ds")), "src")
      .join(deg.select(col("v").as("dst"), col("d").as("dd")), "dst")
      .select(
        when(srcFirst, col("src")).otherwise(col("dst")).as("u"),
        when(srcFirst, col("dst")).otherwise(col("src")).as("w"),
        when(srcFirst, struct(col("dd").as("d"), col("dst").as("v")))
          .otherwise(struct(col("ds").as("d"), col("src").as("v")))
          .as("rank_w"))
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
      canon, deg, oriented, tri)
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
