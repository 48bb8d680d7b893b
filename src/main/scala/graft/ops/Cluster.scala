package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over near-duplicate pair sets — the step that turns
  * pairwise dedup output (Jaccard / MinHash-LSH / SimHash pairs) into
  * actionable clusters: one canonical document kept per component, the rest
  * dropped. The reference pipeline stops at pair detection; a training-data
  * pipeline at 100 TB needs the closure, because near-dup relations chain
  * (A~B, B~C ⇒ {A,B,C} is one duplicate group even when A~C is below
  * threshold).
  *
  * Two algorithms, identical results (component = minimum member id):
  *
  *  - [[alternatingStar]] (the default) — the large-star/small-star
  *    algorithm of Kiveris et al., "Connected Components in MapReduce and
  *    Beyond" (SoCC'14): each round rewires every node toward its
  *    neighborhood minimum, which both halves component height AND
  *    collapses the edge set (a k-clique shrinks toward a star after one
  *    round), so it converges in O(log n) rounds with rapidly shrinking
  *    per-round work. On the sf0.1 near-dup graph (1M pairs, 71 clusters,
  *    max 705 members) it is 2.4× faster than propagation.
  *
  *  - [[labelPropagation]] — each round every node adopts the minimum label
  *    among itself and its neighbors (one equi-join + one min-aggregation,
  *    i.e. two shuffles per round). Converges in O(diameter) rounds and
  *    re-joins the FULL edge set every round — simpler, and the
  *    parity-tested reference implementation, but only competitive when
  *    the diameter is ≤ ~3.
  *
  * Both loops truncate lineage with `localCheckpoint` every round —
  * iterative self-referential plans otherwise grow without bound and
  * re-analyze cost goes super-linear. A multi-hour production run should
  * swap in reliable `checkpoint` (HDFS-backed) so executor loss cannot
  * force a full recompute; the loop structure is unchanged.
  *
  * Convergence detection differs per algorithm. [[labelPropagation]] uses
  * the monotone invariant sum(label): every round can only lower labels,
  * so an unchanged sum (exact, decimal — no overflow at any scale) is a
  * fixpoint. [[alternatingStar]] CANNOT use that probe (its per-round edge
  * rewiring does not monotonically lower a per-src label sum); its
  * fixpoint IS an unchanged edge set, certified by an exact edge-set
  * fingerprint (count + Σ xxhash64, 2^-64 collision bound) — see the
  * in-loop comment. One tiny aggregation per round either way.
  */
object Cluster {

  private def sumLabels(labels: DataFrame): java.math.BigDecimal = {
    val r = labels.agg(sum(col("cluster").cast("decimal(38,0)")).as("s")).head()
    if (r.isNullAt(0)) java.math.BigDecimal.ZERO else r.getDecimal(0)
  }

  /** Symmetric, deduplicated, self-loop-free edge list from a pair frame. */
  private def symmetricEdges(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
    e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** Min-label propagation: (id, cluster) for every node that appears in
    * `pairs`, cluster = minimum id in the node's connected component.
    * O(diameter) rounds, two shuffles per round.
    */
  def labelPropagation(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 50): DataFrame = {
    val spark = pairs.sparkSession
    val chain = new CheckpointChain(spark)
    val edges = symmetricEdges(pairs, aCol, bCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = chain.next(
      edges.select(col("src").as("id")).distinct()
        .withColumn("cluster", col("id")))
    var prevSum = sumLabels(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val prop = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("cluster"))
      labels = chain.next(
        labels.unionByName(prop)
          .groupBy("id").agg(min("cluster").as("cluster")))
      val s = sumLabels(labels)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      i += 1
    }
    require(converged, s"labelPropagation did not converge in $maxIter rounds " +
      "(high-diameter graph — use alternatingStar)")
    edges.unpersist(blocking = false)
    labels
  }

  /** Alternating large-star/small-star (Kiveris et al. SoCC'14): same
    * output contract as [[labelPropagation]], O(log n) rounds on any graph.
    *
    * large-star(u): every strictly-larger neighbor of u is rewired to
    * m(u) = min(Γ(u) ∪ u). small-star(u): u and its smaller neighbors are
    * rewired to m(u), computed over the smaller neighbors only. Each
    * half-round is one groupBy-min plus one join on the edge list; both
    * preserve connectivity, and the fixpoint is a star forest whose
    * centers are the component minima.
    */
  /** Driver-closure ceiling (round-17): a symmetrized pair set at or under
    * this many rows is closed with an exact union-find ON THE DRIVER —
    * one bounded collect (16 B/row data; 8M rows ≈ a few hundred MB of
    * transient Row boxing against the 24g driver) instead of O(log n)
    * star rounds, each of which costs two checkpoint actions' worth of
    * shuffle scheduling regardless of how little data moves. Same
    * size-regime philosophy as a broadcast hash join (the driver already
    * absorbs up to 8 GiB relations there), and the same labels by
    * construction: component = minimum member id, exactly. Near-dup PAIR
    * sets are pairs-of-duplicates, not corpus rows, so even 100 TB
    * corpora commonly land under this; past it the distributed
    * large-star/small-star loop runs unchanged. Overridable per call so
    * the parity spec can force the distributed path on small graphs.
    */
  val DriverClosureCeiling: Long = 8L * 1000 * 1000

  /** Exact min-label connected components via union-find. Unions always
    * point the larger root at the smaller and every member starts as its
    * own root, so each component's root IS its minimum member id — the
    * exact label contract. Pure, for the driver-closure regime and its
    * spec.
    */
  private[graft] def unionFindMinLabels(edges: Array[(Long, Long)])
      : Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x // path compression
      while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // roots are already component minima: unions always point the larger
    // root at the smaller, and every member joined via its own id
    parent.keysIterator.map(k => k -> find(k)).toMap
  }

  def alternatingStar(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 50,
      // observer for scale probes: (round, edge count after the round,
      // seconds) — per-round shuffle volume IS the edge count, so the hook
      // makes the O(log n) round bound and the shrinking per-round work
      // measurable without instrumenting the loop from outside
      onRound: (Int, Long, Double) => Unit = (_, _, _) => (),
      driverClosureCeiling: Long = DriverClosureCeiling): DataFrame = {
    val spark = pairs.sparkSession
    val chain = new CheckpointChain(spark)
    val nodesChain = new CheckpointChain(spark)
    // Symmetrize ONCE — `pairs` is typically an expensive plan (an LSH /
    // blocked-Jaccard pipeline); the checkpoint is the barrier that keeps
    // it from running twice for nodes + edges. The initial fingerprint
    // rides the same job as an observed metric (round-17).
    val obs0 = org.apache.spark.sql.Observation()
    var edges = chain.next(symmetricEdges(pairs, aCol, bCol)
      .observe(obs0, count(lit(1)).as("n"),
        sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)")).as("h")))
    val fp0 = (obs0.get("n").asInstanceOf[Long],
      Option(obs0.get("h").asInstanceOf[java.math.BigDecimal])
        .getOrElse(java.math.BigDecimal.ZERO))
    // Driver-closure regime: the symmetrized pair set fits the bounded
    // collect — close it exactly with union-find, no star rounds at all.
    // Node universe = edge endpoints, identical to the distributed path's
    // `nodes`; labels = component minima, identical by construction.
    if (fp0._1 <= driverClosureCeiling) {
      import spark.implicits._
      val es = edges.select(col("src"), col("dst"))
        .as[(Long, Long)].collect() // bounded by driverClosureCeiling
      chain.release()
      val labels = unionFindMinLabels(es).toSeq
      return spark.createDataset(labels).toDF("id", "cluster")
    }
    // All nodes ever seen: star rounds can drop a component minimum from
    // the `src` side once it only appears as a star center's target.
    val nodes = nodesChain.next(edges.select(col("src").as("id")).distinct())

    def edgeLabels: DataFrame =
      edges.groupBy("src").agg(least(col("src"), min(col("dst"))).as("cluster"))
        .withColumnRenamed("src", "id")

    def currentLabels: DataFrame =
      nodes.join(edgeLabels.withColumnRenamed("cluster", "c"), Seq("id"), "left")
        .select(col("id"), coalesce(col("c"), col("id")).as("cluster"))

    // Convergence probe: the star fixpoint is literally an UNCHANGED edge
    // set, so probe the edge set itself — (count, Σ xxhash64(src,dst)) in
    // exact decimal. Unchanged fingerprint on a changed set is a ~2^-64
    // hash-sum collision; this replaces the round-5 per-src label sum,
    // whose equality over a set whose src population itself shifts between
    // rounds was not a fixpoint certificate (a coincidental equal sum
    // could exit early with wrong labels). Since round 17 the aggregation
    // rides each checkpoint job as an observed metric — zero extra passes.
    var prevFp = fp0
    var converged = prevFp._1 == 0L // no edges at all = already a fixpoint
    var i = 0
    while (!converged && i < maxIter) {
      val roundT0 = System.nanoTime()
      // large-star: m = min over the full neighborhood (incl. self);
      // rewire strictly-larger neighbors to m
      val mLarge = edges.groupBy("src")
        .agg(least(col("src"), min(col("dst"))).as("m"))
      val large = edges.join(mLarge, "src")
        .filter(col("dst") > col("src"))
        .select(col("dst").as(aCol), col("m").as(bCol))
      edges = chain.next(symmetricEdges(large, aCol, bCol))
      // small-star: per node u over its smaller-or-equal neighbors N,
      // m = min(N); rewire u and N to m
      val directed = edges.filter(col("dst") < col("src"))
      val mSmall = directed.groupBy("src").agg(min(col("dst")).as("m"))
      val small = directed.join(mSmall, "src")
        .select(col("dst").as(aCol), col("m").as(bCol))
        .union(mSmall.select(col("src").as(aCol), col("m").as(bCol)))
      // the fingerprint rides the small-star checkpoint job as an observed
      // metric (round-17) — the standalone edgeFingerprint() pass per round
      // was a third job re-reading the table the checkpoint just wrote
      val obs = org.apache.spark.sql.Observation()
      edges = chain.next(symmetricEdges(small, aCol, bCol)
        .observe(obs, count(lit(1)).as("n"),
          sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)")).as("h")))
      val fp = (obs.get("n").asInstanceOf[Long],
        Option(obs.get("h").asInstanceOf[java.math.BigDecimal])
          .getOrElse(java.math.BigDecimal.ZERO))
      converged = fp._1 == prevFp._1 && fp._2.compareTo(prevFp._2) == 0
      prevFp = fp
      i += 1
      onRound(i, fp._1, (System.nanoTime() - roundT0) / 1e9)
    }
    require(converged, s"alternatingStar did not converge in $maxIter rounds")
    val out = chain.next(currentLabels) // frees the final edge round too
    nodesChain.release()
    out
  }

  /** Full dedup clustering: every node of `nodes` labeled with its
    * component (`cluster_id` = min member id; isolated nodes form their own
    * cluster), plus `cluster_size` and the keep-one-per-cluster flag
    * `is_canonical` (true exactly for the minimum member).
    *
    * Scale shape: the iterative closure runs on the PAIR set (tiny next to
    * the corpus — near-dup pairs, not rows); the corpus itself is touched
    * by exactly one left join + one window.
    */
  def clusters(nodes: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String, bCol: String,
      algo: (DataFrame, String, String, Int) => DataFrame = alternatingStar(_, _, _, _),
      maxIter: Int = 50): DataFrame = {
    val labels = algo(pairs, aCol, bCol, maxIter)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("cluster_id"))
    nodes.select(col(idCol).cast("long").as("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("cluster"), col("id")).as("cluster_id"))
      .withColumn("cluster_size", count(lit(1)).over(w))
      // canonical = min PRESENT member, not cluster_id itself: when `nodes`
      // is a subset of the pair universe, the component minimum may be
      // absent — comparing against cluster_id would then leave the whole
      // cluster with NO canonical row, and a keep-one-per-cluster consumer
      // would drop the entire duplicate group.
      .withColumn("is_canonical", col(idCol) === min(col(idCol)).over(w))
  }
}
