package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deterministic PageRank in exact integer arithmetic — the iterative
  * join+aggregate workload (the pattern behind label propagation, embedding
  * propagation, influence scoring) made bit-portable:
  *
  *  - ranks live in integer mass units (scale 1e12), so partial-aggregation
  *    sums are exact and order-independent — the same result on any cluster
  *    topology, and replayable by any engine with integer division;
  *  - each edge carries `floor(rank(src) / outdeg(src))`; the damping is
  *    `base + (17 · Σ) div 20` (0.85 as a ratio of integers);
  *  - iteration count is FIXED (a contract, not a convergence test), so
  *    the oracle can unroll the same number of steps.
  *
  * Scale design: the edge list is shuffled ONCE onto its join key and
  * persisted; each iteration is one shuffle (groupBy dst) + one broadcast-
  * or sort-merge join against the (nodes-sized) rank table. Lineage is cut
  * with localCheckpoint every few rounds (same rolling-chain pattern as
  * ops.Cluster) so the plan does not grow with iterations.
  */
object PageRank {

  val Scale: Long = 1000000000000L // 1e12 mass units

  /** Broadcast-regime ceiling for ROW-PER-NODE score/label tables that are
    * re-broadcast every iteration (~64 B/row in the driver-built hashed
    * relation → 1M nodes ≈ 64 MB per round): shared by PageRank, PPR,
    * HITS and LabelProp. Edge-payload broadcasts (array-packed, 8–16
    * B/row, built once) use the separate 32M figure in
    * Triangles/RandomWalk. Overridable per call as a test knob so the
    * keyed-join fallback regime is parity-testable on small graphs.
    */
  val BcastNodeCeiling: Long = 1000000L

  /** Run `iters` fixed iterations over a directed edge list (srcCol,
    * dstCol). The node universe is the SOURCE side: every node must have
    * out-degree ≥ 1, and a destination that never appears as a source (a
    * dangling sink — it would silently absorb mass the integer contract
    * cannot redistribute) fails loudly up front; symmetrize bipartite or
    * sink-bearing inputs first. Returns (node_id, rank_scaled).
    */
  def run(edgesDf: DataFrame, srcCol: String, dstCol: String,
      iters: Int, bcastNodeCeiling: Long = BcastNodeCeiling): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = edgesDf.sparkSession
    val edges = edgesDf
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // ONE node-stats pass replaces three separate edge-list passes
    // (deg aggregation, nodes distinct, dangling-check dst-distinct +
    // anti-join — round-17, guide §1.2 "remove unnecessary passes"):
    // per node, `d` = out-degree (each edge contributes one src tag) and
    // `_src` records whether the node ever appears as a source — a node
    // seen only as dst is exactly a dangling sink.
    val stats = edges.select(col("src").as("v"), lit(1).as("_s"))
      .unionAll(edges.select(col("dst").as("v"), lit(0).as("_s")))
      .groupBy("v").agg(sum("_s").as("d"), max("_s").as("_src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cnts = stats.agg(
      count(when(col("_src") === 1, 1)).as("n"),
      count(when(col("_src") === 0, 1)).as("nd")).head()
    val n = cnts.getLong(0)
    val nDangling = cnts.getLong(1)
    require(n > 0, "empty graph")
    require(nDangling == 0L, s"$nDangling node(s) have in-edges but no " +
      "out-edges — PageRank's contract requires out-degree >= 1 for every " +
      "node; symmetrize the edge list (or drop edges into sinks) first")
    val deg = stats.select(col("v").as("src"), col("d"))
    val nodes = stats.select(col("v"))
    // Partitioning choice is keyed to HOW the per-iteration join runs:
    //  - rank table broadcastable (the common shape — node table orders of
    //    magnitude smaller than the edge list): the join needs NO edge
    //    partitioning, so pre-partition edges on DST, the aggregation key.
    //    The broadcast join preserves the streamed side's partitioning and
    //    the dst→v alias keeps it visible, so every iteration's groupBy
    //    runs WITHOUT an exchange — zero per-iteration edge shuffles.
    //  - rank table too big to broadcast: partition on SRC so the
    //    sort-merge join co-locates against the rank table instead, and
    //    pay the groupBy shuffle.
    // Cutoff: a (long, long) row costs ~64 B in the driver-built hashed
    // relation, so 1M nodes ≈ 64 MB re-broadcast per iteration — about the
    // most a driver should absorb every round (the superseded iteration's
    // broadcast is reclaimed by ContextCleaner once `chain.unpersist` +
    // the `pr` reassignment drop the last plan reference, so transient
    // accumulation is bounded by one round's table, not `iters` of them).
    // The round-7 10M cutoff risked ~640 MB/round re-broadcasts and
    // driver memory pressure right at the threshold.
    val broadcastRanks = n <= bcastNodeCeiling
    // one prepared, co-partitioned edge table reused by every iteration;
    // deg is node-sized, so in the broadcast regime the attach join moves
    // no edge bytes (only the repartition onto dst does)
    val edgesD = edges
      .join(if (broadcastRanks) broadcast(deg) else deg, "src")
      .repartition(if (broadcastRanks) col("dst") else col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    edgesD.count()
    val init = Scale / n
    val base = (Scale * 3L / 20L) / n

    var pr = nodes.withColumn("r", lit(init))
    if (broadcastRanks) {
      // LAZY broadcast chain (round-17 optimization, guide §1.2/§2.4):
      // with node-sized rank tables every round is (edgesD ⋈ bcast(pr))
      // → exchange-free groupBy on the pre-partitioned dst → nodes ⟕
      // bcast(contrib). Each round's table is consumed exactly ONCE (by
      // the next round's broadcast build), so nothing needs a per-round
      // persist/count barrier: one sealing action at the end builds the
      // nested broadcasts bottom-up, each exactly once. Measured on q76
      // (sf0.1): 47 jobs → ~1/round, 5.2 s → well under half — the old
      // loop spent most of its time in per-round count() actions, AQE
      // stage jobs and persist/unpersist churn, not in rank arithmetic.
      // Plan depth is O(iters), bounded by the fixed-rounds contract;
      // the >1M-node regime keeps the materializing loop below.
      for (_ <- 1 to iters) {
        // integer division (DIV), NOT `/`: Spark's `/` is double division,
        // whose truncation can land one off when the rounded quotient
        // crosses an integer boundary
        val contrib = edgesD
          .join(broadcast(pr.withColumnRenamed("v", "src")), "src")
          .select(col("dst").as("v"), expr("r DIV d").as("c"))
          .groupBy("v")
          .agg(sum("c").as("s"))
        // LEFT join back onto the full node set: the aggregation only
        // yields nodes with in-edges, so a zero-in-degree node would
        // vanish from the rank table after round 1 (and stop contributing
        // from round 2). runRef keeps it at `base`; coalesce(s, 0)
        // matches that exactly. contrib is node-sized — broadcast it so
        // the outer join moves neither side.
        pr = nodes.join(broadcast(contrib), Seq("v"), "left")
          .select(col("v"),
            (lit(base) + expr("(17 * coalesce(s, 0)) DIV 20")).as("r"))
      }
    } else {
      pr = pr.persist(StorageLevel.MEMORY_AND_DISK)
      pr.count()
      var chain = List(pr)
      val ckpt = new CheckpointChain(spark)
      for (i <- 1 to iters) {
        val contrib = edgesD.join(pr, edgesD("src") === pr("v"))
          .select(col("dst").as("v"), expr("r DIV d").as("c"))
          .groupBy("v")
          .agg(sum("c").as("s"))
        val next0 = nodes.join(contrib, Seq("v"), "left")
          .select(col("v"),
            (lit(base) + expr("(17 * coalesce(s, 0)) DIV 20")).as("r"))
        // cut lineage every 4 rounds (CheckpointChain frees the superseded
        // checkpoint's RDD blocks, which Dataset.unpersist cannot reach);
        // otherwise persist is enough
        val next =
          if (i % 4 == 0) ckpt.next(next0)
          else next0.persist(StorageLevel.MEMORY_AND_DISK)
        next.count()
        chain.foreach(_.unpersist(false))
        chain = if (i % 4 == 0) Nil else List(next)
        pr = next
      }
    }
    // seal: materialize the final ranks, then release the pins the loop
    // left behind (edge tables + the last round's frame)
    Pins.sealOutput(
      pr.select(col("v").as("node_id"), col("r").as("rank_scaled")),
      edges, stats, edgesD, pr)
  }

  /** PERSONALIZED PageRank: the teleport mass lands only on `seeds`
    * (one column `v`, each a graph node), so ranks measure proximity to
    * the seed set — the "relevance to a trusted corpus" signal behind
    * seed-expanded curation (find pages close to known-good ones). Same
    * integer contract as [[run]]: init = Scale DIV |S| on seeds (0
    * elsewhere), per-round r(v) = b(v) + ⌊17·Σ contrib⌋/20 with the
    * per-NODE base b(v) = (3·Scale/20) DIV |S| on seeds and 0 elsewhere
    * — the only structural change from run() is that the base is a
    * node-attributed column instead of a constant. Same broadcast-regime
    * plan: edges pre-partitioned on dst, rank table broadcast, zero
    * per-iteration edge shuffles.
    */
  def personalized(edgesDf: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, iters: Int,
      bcastNodeCeiling: Long = BcastNodeCeiling): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = edgesDf.sparkSession
    val edges = edgesDf
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val seedSet = seeds.select(col("v").cast("long").as("v")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nSeeds = seedSet.count()
    require(nSeeds > 0, "personalized pagerank needs a non-empty seed set")
    val init = Scale / nSeeds
    val b = (Scale * 3L / 20L) / nSeeds
    // ONE node-stats pass for degree + node universe + dangling + seed
    // membership (round-17 — same fused-prep rationale as [[run]]; the
    // seed flag rides the same aggregate via a broadcast left join before
    // the groupBy, so the seed-membership guard needs no extra pass)
    val stats = edges.select(col("src").as("v"), lit(1).as("_s"))
      .unionAll(edges.select(col("dst").as("v"), lit(0).as("_s")))
      .groupBy("v").agg(sum("_s").as("d"), max("_s").as("_src"))
      .join(broadcast(seedSet.withColumn("_sd", lit(1))), Seq("v"), "left")
      .withColumn("_isSeed", coalesce(col("_sd"), lit(0)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cnts = stats.agg(
      count(when(col("_src") === 1, 1)).as("n"),
      count(when(col("_src") === 0, 1)).as("nd"),
      count(when(col("_isSeed") === 1 && col("_src") === 1, 1)).as("ns")).head()
    val n = cnts.getLong(0)
    require(cnts.getLong(1) == 0L, s"${cnts.getLong(1)} node(s) have " +
      "in-edges but no out-edges — symmetrize the edge list (or drop sink " +
      "edges) first")
    val nSeedsInGraph = cnts.getLong(2)
    require(nSeedsInGraph == nSeeds,
      s"${nSeeds - nSeedsInGraph} seed(s) are not graph nodes — the " +
        "teleport mass would silently vanish; intersect the seed set first")
    val deg = stats.select(col("v").as("src"), col("d"))
    // node universe + per-node base/init in ONE node-sized table
    val nodes = stats.select(col("v"),
      when(col("_isSeed") === 1, lit(b)).otherwise(lit(0L)).as("b"),
      when(col("_isSeed") === 1, lit(init)).otherwise(lit(0L)).as("r0"))
    val broadcastRanks = n <= bcastNodeCeiling
    val edgesD = edges
      .join(if (broadcastRanks) broadcast(deg) else deg, "src")
      .repartition(if (broadcastRanks) col("dst") else col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    edgesD.count()
    var pr = nodes.select(col("v"), col("r0").as("r"))
    if (broadcastRanks) {
      // lazy broadcast chain — same structure and rationale as [[run]]
      // (the only arithmetic difference is the per-node base column)
      for (_ <- 1 to iters) {
        val contrib = edgesD
          .join(broadcast(pr.withColumnRenamed("v", "src")), "src")
          .select(col("dst").as("v"), expr("r DIV d").as("c"))
          .groupBy("v")
          .agg(sum("c").as("s"))
        pr = nodes.join(broadcast(contrib), Seq("v"), "left")
          .select(col("v"),
            (col("b") + expr("(17 * coalesce(s, 0)) DIV 20")).as("r"))
      }
    } else {
      pr = pr.persist(StorageLevel.MEMORY_AND_DISK)
      pr.count()
      var chain = List(pr)
      val ckpt = new CheckpointChain(spark)
      for (i <- 1 to iters) {
        val contrib = edgesD.join(pr, edgesD("src") === pr("v"))
          .select(col("dst").as("v"), expr("r DIV d").as("c"))
          .groupBy("v")
          .agg(sum("c").as("s"))
        val next0 = nodes.join(contrib, Seq("v"), "left")
          .select(col("v"),
            (col("b") + expr("(17 * coalesce(s, 0)) DIV 20")).as("r"))
        val next =
          if (i % 4 == 0) ckpt.next(next0)
          else next0.persist(StorageLevel.MEMORY_AND_DISK)
        next.count()
        chain.foreach(_.unpersist(false))
        chain = if (i % 4 == 0) Nil else List(next)
        pr = next
      }
    }
    Pins.sealOutput(
      pr.select(col("v").as("node_id"), col("r").as("rank_scaled")),
      edges, stats, edgesD, seedSet, pr)
  }

  /** JVM twin of [[personalized]] for tests. */
  def personalizedRef(edges: Seq[(Long, Long)], seeds: Set[Long],
      iters: Int): Map[Long, Long] = {
    val es = edges.distinct
    val deg = es.groupBy(_._1).map { case (s, g) => s -> g.size.toLong }
    val nodes = es.map(_._1).distinct
    val init = Scale / seeds.size
    val b = (Scale * 3L / 20L) / seeds.size
    var pr = nodes.map(v => v -> (if (seeds(v)) init else 0L)).toMap
    for (_ <- 1 to iters) {
      val contribs = es.groupBy(_._2).map { case (dst, g) =>
        dst -> g.map { case (s, _) => pr(s) / deg(s) }.sum
      }
      pr = nodes.map(v => v ->
        ((if (seeds(v)) b else 0L) + 17L * contribs.getOrElse(v, 0L) / 20L)).toMap
    }
    pr
  }

  /** In-memory reference for tests (same integer arithmetic). */
  def runRef(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val es = edges.distinct
    val deg = es.groupBy(_._1).map { case (s, g) => s -> g.size.toLong }
    val nodes = es.map(_._1).distinct
    val n = nodes.size.toLong
    val init = Scale / n
    val base = (Scale * 3L / 20L) / n
    var pr = nodes.map(_ -> init).toMap
    for (_ <- 1 to iters) {
      val contribs = es.groupBy(_._2).map { case (dst, g) =>
        dst -> g.map { case (s, _) => pr(s) / deg(s) }.sum
      }
      pr = nodes.map(v => v -> (base + 17L * contribs.getOrElse(v, 0L) / 20L)).toMap
    }
    pr
  }
}
