package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Synchronous label-propagation community detection (Raghavan et al.,
  * Phys. Rev. E 2007) made deterministic: every node starts with its own id
  * as label; each round every node adopts the label most frequent among its
  * neighbors, ties broken by SMALLEST label; the round count is FIXED (a
  * contract, not a convergence test). Classic LPA breaks ties randomly and
  * updates asynchronously — both are non-reproducible under distributed
  * execution, so this variant pins both choices, making the result exactly
  * replayable by an unrolled SQL oracle (same contract philosophy as
  * [[PageRank]]).
  *
  * Scale design (identical to PageRank's): the symmetrized edge list is
  * shuffled ONCE onto dst and persisted; each round joins the nodes-sized
  * label table (broadcast under the same 1M-node cutoff) and aggregates
  * per (dst, label) with map-side combine — zero per-round edge shuffles on
  * the broadcast path. The argmax is `max(struct(cnt, -label))`, a single
  * aggregate, not a per-group sort. Lineage is cut with CheckpointChain so
  * plan depth stays O(1) in rounds.
  */
object LabelProp {

  /** Run `rounds` fixed rounds over an undirected graph given as a directed
    * edge list (the op symmetrizes + dedups internally). Returns
    * (node_id, community) for every node incident to an edge.
    */
  def run(edgesDf: DataFrame, srcCol: String, dstCol: String,
      rounds: Int, bcastNodeCeiling: Long = PageRank.BcastNodeCeiling)
      : DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = edgesDf.sparkSession
    val dir = edgesDf.select(
      col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    val edges = dir
      .unionByName(dir.select(col("dst").as("src"), col("src").as("dst")))
      .where(col("src") =!= col("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = edges.select(col("src").as("v")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    require(n > 0, "empty graph")
    val broadcastLabels = n <= bcastNodeCeiling
    val edgesD = edges
      .repartition(if (broadcastLabels) col("dst") else col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    edgesD.count()

    var lab = nodes.withColumn("label", col("v"))
    if (broadcastLabels) {
      // LAZY broadcast chain (round-17, same rationale as PageRank): each
      // round consumes the previous label table exactly once via its
      // broadcast build, the two-level aggregate runs exchange-free on the
      // dst-pre-partitioned edge copy (hash(dst) satisfies both the
      // (dst,label) and the dst clustering), so no per-round persist /
      // count barrier is needed — one sealing action builds the nested
      // broadcasts bottom-up, each exactly once.
      for (_ <- 1 to rounds) {
        lab = edgesD
          .join(broadcast(lab.withColumnRenamed("v", "src")), "src")
          .groupBy(col("dst"), col("label"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy(col("dst").as("v2"))
          .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
          .select(col("v2").as("v"), (-col("m.nl")).as("label"))
      }
    } else {
      lab = lab.persist(StorageLevel.MEMORY_AND_DISK)
      lab.count()
      var chain = List(lab)
      val ckpt = new CheckpointChain(spark)
      for (i <- 1 to rounds) {
        val next0 = edgesD.join(lab, edgesD("src") === lab("v"))
          .groupBy(col("dst"), col("label"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy(col("dst").as("v2"))
          .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
          .select(col("v2").as("v"), (-col("m.nl")).as("label"))
        val next =
          if (i % 4 == 0) ckpt.next(next0)
          else next0.persist(StorageLevel.MEMORY_AND_DISK)
        next.count()
        chain.foreach(_.unpersist(false))
        chain = if (i % 4 == 0) Nil else List(next)
        lab = next
      }
    }
    // seal: materialize the final labeling, then release every pin the
    // loop left behind (graph tables + the last round's frame); unpersist
    // on a checkpoint-chain frame is a no-op
    Pins.sealOutput(
      lab.select(col("v").as("node_id"), col("label").as("community")),
      edges, nodes, edgesD, lab)
  }

  /** In-memory reference for tests (same synchronous min-tiebreak rule). */
  def runRef(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val es = (edges ++ edges.map(_.swap)).filter(e => e._1 != e._2).distinct
    val adj = es.groupBy(_._1).map { case (v, g) => v -> g.map(_._2) }
    var lab = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to rounds) {
      lab = adj.map { case (v, ns) =>
        val freq = ns.groupBy(lab).map { case (l, g) => (l, g.size) }
        v -> freq.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lab
  }
}
