package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** HITS hubs-and-authorities (Kleinberg, JACM'99) over a DIRECTED edge
  * list — the link-analysis complement to [[PageRank]]: a node is a good
  * HUB when it points at good authorities, a good AUTHORITY when good
  * hubs point at it. Curation use: in a citation/link graph over a crawl,
  * authority scores surface canonical documents and hub scores surface
  * index/listing pages (which a quality filter usually wants to
  * down-weight).
  *
  * Exactness contract (the [[PageRank]] convention): all arithmetic is
  * scaled-int — init `Scale` per node, per-round sums are exact Long, and
  * the textbook L2 normalization (a sqrt — not portable) is replaced by
  * integer max-rescaling: after each half-step every score is divided by
  * `ceil(max/Scale)` (integer DIV), bounding scores at ~`Scale` with zero
  * floating point. Same fixed point structure, deterministic on any
  * engine/partitioning, and the DuckDB oracle replays it term-for-term
  * with unrolled iteration CTEs (the q76 pattern).
  *
  * Overflow budget: after rescale every score ≤ Scale (1e12); a sum over
  * in/out-degree d keeps d·Scale < 2^63 up to d ≈ 9·10⁶ — far past any
  * realistic per-node degree in a curation graph. Past it, Long overflow
  * flips signs — and that IS detected: every half-step's rescale
  * aggregate also takes min(score) and raise_error()s on a negative
  * (scores are sums of non-negatives, so any negative is an overflow),
  * turning the silent-garbage mode into a loud failure (round-10 advice).
  *
  * Scale shape: two regimes on the same arithmetic. Node-sized score
  * tables broadcast into edge copies pre-partitioned by each half-step's
  * GROUP key (src / dst) — the broadcast join preserves that
  * partitioning, so every per-round groupBy runs on co-located data and
  * the edge-sized shuffle is paid twice TOTAL, not twice per round. Past
  * the broadcast ceiling (1 M nodes — [[PageRank.BcastNodeCeiling]]; the
  * table is re-broadcast every half-step) the keyed-join form runs
  * unchanged, including the overflow guard: `rescaled` is shared by both
  * regimes, so the raise_error projection is regime-independent.
  * Per-round localCheckpoint cuts the 2·iters-join lineage; output
  * sealed, all edge pins released ([[Pins]]).
  */
object Hits {

  val Scale: Long = PageRank.Scale // 1e12, shared convention

  /** Run `iters` full hub→authority→hub rounds; returns
    * (node_id, hub_scaled, auth_scaled) for every node incident to an
    * edge. Self-loops allowed (they just feed a node's own scores);
    * duplicate edges collapse (distinct) so multiplicity doesn't double
    * mass.
    */
  def run(edgesDf: DataFrame, srcCol: String, dstCol: String,
      iters: Int, bcastNodeCeiling: Long = PageRank.BcastNodeCeiling)
      : DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val edges = edgesDf
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = edges.select(col("src").as("v"))
      .union(edges.select(col("dst").as("v")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Broadcast regime (score tables are node-sized): pre-partition the
    // edge table ONCE by each half-step's GROUP key and broadcast the
    // score side — the broadcast join preserves the edge partitioning, so
    // every groupBy lands on already-co-located data and the per-half-step
    // edge-sized shuffle disappears (2·iters shuffles → 2, paid once).
    // Past the broadcast ceiling the keyed-join form below runs unchanged.
    // Ceiling = PageRank's 1M-node figure, NOT the 32M edge-payload
    // threshold Triangles/RandomWalk use: the score table is a row-per-node
    // hashed relation (~64 B/row driver-side), and it is re-broadcast
    // 2·iters times (once per half-step) — 1M nodes ≈ 64 MB per broadcast
    // is the most the driver should absorb every half-step. 32M would have
    // meant two ~2 GiB collects+broadcasts per round: an OOM cliff.
    // (bcastNodeCeiling is a test knob: the fallback-parity spec pins the
    // keyed-join regime to the broadcast regime's exact output.)
    val bcastScores = nodes.count() <= bcastNodeCeiling
    val edgesByDst = if (bcastScores)
      edges.repartition(col("dst")).persist(StorageLevel.MEMORY_AND_DISK)
      else edges
    val edgesBySrc = if (bcastScores)
      edges.repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
      else edges
    def scoreSide(s: DataFrame): DataFrame =
      if (bcastScores) broadcast(s) else s

    // integer max-rescale: x -> x DIV max(1, ceil(max(x)/Scale)); the
    // 1-row max arrives via broadcast crossJoin — no driver action.
    // The raw scores are pinned FIRST: the max aggregate and the rescale
    // projection both read them, and without the pin each half-step would
    // double-evaluate its join lineage (measured 7.9 s → 40+ s at sf0.1
    // when the pin sat after the rescale instead of before the fan-out).
    def rescaled(scores: DataFrame, c: String): DataFrame = {
      // localCheckpoint, NOT a lazy persist (round-17 finding): each
      // half-step reads its predecessor TWICE (max aggregate + rescale
      // projection), so without an eager cut the logical tree doubles per
      // half-step — and AQE renders the plan string on every stage update
      // (AdaptiveSparkPlanExec.onUpdatePlan → explainString), which turned
      // 2^(2·iters) nested copies into ~80 s of pure driver string
      // building at sf0.1. The PageRank/LabelProp lazy chains are safe
      // because their fan-out is 1; fan-out-2 iteration must stay
      // checkpointed.
      val pinned = scores.localCheckpoint()
      // min rides the same 1-row aggregate as max (no extra pass): scores
      // are sums of non-negatives, so min < 0 can ONLY mean a Long sum
      // sign-flipped — the degree budget (scaladoc) was exceeded. The
      // assert_true is attached arithmetically (null→0 on success) so the
      // guard lives inside the same projection, no extra action or filter.
      val mx = pinned.agg(max(col(c)).as("_mx"), min(col(c)).as("_mn"))
      pinned.crossJoin(broadcast(mx))
        .select(col("v"),
          (expr(s"$c DIV greatest(1L, (_mx + ${Scale - 1}L) DIV ${Scale}L)") +
            coalesce(expr("assert_true(_mn >= 0, concat('graft hits: " +
              "half-step Long sum overflowed (min=', _mn, ') — per-node " +
              "degree exceeds the ~9.2e6 budget at Scale=1e12'))")
              .cast("long"), lit(0L))).as(c))
    }

    var hub = nodes.select(col("v"), lit(Scale).as("h")).localCheckpoint()
    var auth: DataFrame = null
    for (i <- 1 to iters) {
      // authority half-step: a(v) = Σ_{u→v} h(u), absent in-edges → 0
      val aRaw = edgesByDst
        .join(scoreSide(hub.withColumnRenamed("v", "src")), "src")
        .groupBy(col("dst").as("v")).agg(sum("h").as("a"))
      // each rescaled() output is a cheap projection over its internal
      // pin, so no further checkpoints are needed: auth feeds the hub
      // half-step (and, in the last round, the output join) straight off
      // the pinned table
      auth = rescaled(
        nodes.join(aRaw, Seq("v"), "left")
          .select(col("v"), coalesce(col("a"), lit(0L)).as("a")), "a")
      // hub half-step: h(v) = Σ_{v→w} a(w), absent out-edges → 0
      val hRaw = edgesBySrc
        .join(scoreSide(auth.withColumnRenamed("v", "dst")), "dst")
        .groupBy(col("src").as("v")).agg(sum("a").as("h"))
      hub = rescaled(
        nodes.join(hRaw, Seq("v"), "left")
          .select(col("v"), coalesce(col("h"), lit(0L)).as("h")), "h")
    }
    Pins.sealOutput(
      hub.join(auth, "v")
        .select(col("v").as("node_id"), col("h").as("hub_scaled"),
          col("a").as("auth_scaled")),
      edges, nodes, edgesByDst, edgesBySrc)
  }

  /** In-memory reference for tests (same integer arithmetic). */
  def runRef(edges: Seq[(Long, Long)], iters: Int): Map[Long, (Long, Long)] = {
    val es = edges.distinct
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
    def rescale(m: Map[Long, Long]): Map[Long, Long] = {
      val mx = m.values.max
      val d = math.max(1L, (mx + Scale - 1) / Scale)
      m.map { case (k, x) => k -> x / d }
    }
    var hub = nodes.map(_ -> Scale).toMap
    var auth = Map.empty[Long, Long]
    for (_ <- 1 to iters) {
      auth = rescale(nodes.map(v =>
        v -> es.filter(_._2 == v).map(e => hub(e._1)).sum).toMap)
      hub = rescale(nodes.map(v =>
        v -> es.filter(_._1 == v).map(e => auth(e._2)).sum).toMap)
    }
    nodes.map(v => v -> (hub(v), auth(v))).toMap
  }
}
