package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization for ANN at scale: symmetric per-vector int8 —
  * q[i] = round(v[i] · 127 / max|v|), dequantized as q[i] · scale with
  * scale = max|v| / 127. Shrinks a float32 corpus 4× (the difference
  * between an index fitting executor memory or not) at a bounded error of
  * scale/2 per component (QuantizeSpec proves the bound).
  *
  * All math is a per-row column expression (no shuffle, no UDF): the
  * rounding is the portable floor(x + 0.5) form, so any engine reproduces
  * the quantized codes bit-for-bit — which also makes the codes a stable
  * content fingerprint of the vector across reruns and engines.
  */
object Quantize {

  /** max|v| of a float-array column, computed in double. */
  def maxAbs(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** Symmetric int8 codes as an array<long> (range [-127, 127]); an
    * all-zero vector quantizes to zeros.
    */
  def int8Codes(vec: Column): Column = {
    val mx = maxAbs(vec)
    when(mx > 0,
      transform(vec, x => floor(x.cast("double") * 127.0d / mx + 0.5d).cast("long")))
      .otherwise(transform(vec, _ => lit(0L)))
  }

  /** Dequantized doubles from codes + the vector's maxAbs. */
  def dequantize(codes: Column, mxAbs: Column): Column =
    transform(codes, q => q.cast("double") * mxAbs / 127.0d)

  /** Deterministic seed centroids for [[pqCodes]]: the first `k` vectors
    * by id, scaled (1e6 integer) and split into `m` subspaces — a
    * "training" any engine replays exactly (the gate contract). Swap in
    * per-subspace KMeans centroids (e.g. via `graft.ml.MlBridge`) when
    * recall matters; the coding path is identical.
    */
  def pqSeedCentroids(df: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int): Array[Array[Array[Long]]] = {
    // null embeddings carry nothing to seed with — skip them (round-12
    // null-payload sweep: getSeq on a null row NPE'd here)
    val rows = df.where(col(vecCol).isNotNull).orderBy(col(idCol)).limit(k)
      .select(Similarity.scaled(col(vecCol)).as("_s"))
      .collect().map(_.getSeq[Long](0).toArray)
    require(rows.nonEmpty,
      s"PQ codebook needs at least one seed vector — empty corpus?")
    require(rows(0).length % m == 0,
      s"need vector dim ${rows(0).length} divisible by m=$m")
    val sub = rows(0).length / m
    Array.tabulate(m)(mi => rows.map(r => r.slice(mi * sub, (mi + 1) * sub)))
  }

  /** Product quantization (Jégou/Douze/Schmid TPAMI 2011): split the
    * 1e6-scaled integer vector into `m` subspaces and code each against
    * the per-subspace centroids by squared-L2 argmin (ties → lowest
    * centroid index). Output: (id, `codes` = dash-joined code string,
    * `qerr_scaled` = Σ_m min dist² in scaled² units) — the m-byte
    * compressed layout behind IVF-PQ billion-vector indexes.
    *
    * Exactness: with scaled-long vectors the argmin key is
    * `‖c‖² − 2·v·c` in pure integer arithmetic, so codes and error are
    * engine- and topology-independent — no IEEE anywhere.
    *
    * Scale shape: the centroid table is m·k·(d/m) literals baked into a
    * map-only projection — no join, no shuffle; per subspace the argmin
    * is the array_sort-over-scored-structs form (each centroid dot
    * evaluated once per consumer — see IvfIndex.nearestCentroid for why
    * a reduce chain is pathological). Natural struct ordering
    * (key asc, ci asc) IS the tiebreak, so no comparator lambda.
    */
  def pqCodes(df: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Array[Long]]]): DataFrame = {
    val (withSubs, parts) = codedParts(df, idCol, vecCol, cents)
    // parts is referenced by both output columns: the duplication is
    // LINEAR (two evaluations of an m·k-struct sort), not the 2^k reduce
    // blow-up — acceptable, and codegen subexpression elimination
    // collapses most of it
    withSubs.select(col(idCol),
      concat_ws("-", parts.map(_.getField("code").cast("string")): _*).as("codes"),
      parts.map(_.getField("dist")).reduceLeft(_ + _).as("qerr_scaled"))
  }

  /** Shared coding path: per-subspace (dist², code) structs over the
    * scaled-long subvectors. Returns the subvector projection and one
    * struct column per subspace.
    */
  private def codedParts(df: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Array[Long]]]): (DataFrame, Seq[Column]) = {
    val m = cents.length
    require(m > 0 && cents.forall(_.nonEmpty), "need >= 1 subspace with centroids")
    val sub = cents(0)(0).length
    val spread = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol), Similarity.scaled(col(vecCol)).as("_sv"))
    // materialize subvectors once per row: each feeds k centroid dots
    val withSubs = spread.select(col(idCol) +: (0 until m).map(mi =>
      slice(col("_sv"), mi * sub + 1, sub).as(s"_s$mi")): _*)
    val parts = (0 until m).map { mi =>
      val vm = col(s"_s$mi")
      val scored = array(cents(mi).zipWithIndex.map { case (cv, ci) =>
        val cNorm = cv.map(x => x * x).sum // exact Long, Scala-side
        struct(
          (lit(cNorm) - lit(2L) * graft.functions.Dot.long(vm, typedLit(cv.toSeq)))
            .as("key"),
          lit(ci).as("ci"))
      }: _*)
      val best = array_sort(scored).getItem(0)
      struct(
        (graft.functions.Dot.long(vm, vm) + best.getField("key")).as("dist"),
        best.getField("ci").as("code"))
    }
    (withSubs, parts)
  }

  /** ADC (asymmetric distance computation) top-k search over PQ codes —
    * the IVF-PQ query-time primitive (Jégou TPAMI 2011 §IV): each query
    * precomputes an m×k lookup table of exact sub-distances to every
    * centroid, and a document's approximate distance is m table lookups
    * on its codes,
    *
    *   adc(q, v) = Σ_m ‖q_m − c_{m, code_m(v)}‖²  (= ‖q − reconstruct(v)‖²)
    *
    * Output: (query_id, doc_id, adc_scaled, rank) for the k nearest codes
    * per query (adc asc, id tiebreak).
    *
    * Exactness: LUT entries are exact Longs from 1e6-scaled integer
    * vectors, per-doc combination is exact sums of m lookups.
    *
    * Scale shape: the LUT (queries × m × k longs) is driver-built from the
    * bounded query slice and baked as literals into a MAP-ONLY scan — the
    * corpus is never shuffled, never joined; each doc costs m array
    * lookups per query. The per-query top-k is a rank window whose
    * partial WindowGroupLimit trims each partition to k before the one
    * shuffle. This is why PQ wins at 100 TB: the scan reads m bytes per
    * doc, not the full vector.
    */
  def adcTopK(df: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Array[Long]]], queryPred: Column,
      k: Int): DataFrame = {
    val m = cents.length
    val sub = cents(0)(0).length
    val queries = df.filter(queryPred && col(vecCol).isNotNull)
      .orderBy(col(idCol))
      .select(col(idCol).cast("long"), Similarity.scaled(col(vecCol)).as("_s"))
      .limit(257).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    require(queries.nonEmpty && queries.length <= 256,
      s"query slice must be 1..256 vectors, got ${queries.length}")
    val (withSubs, parts) = codedParts(df, idCol, vecCol, cents)
    val coded = withSubs.select(col(idCol) +: (0 until m).map(mi =>
      parts(mi).getField("code").as(s"_c$mi")): _*)
    def lutRow(qv: Array[Long], mi: Int): Seq[Long] =
      cents(mi).toSeq.map { cv =>
        var s = 0L; var j = 0
        while (j < sub) {
          val d = qv(mi * sub + j) - cv(j); s += d * d; j += 1
        }
        s
      }
    val perQuery = queries.map { case (qid, qv) =>
      val adc = (0 until m).map(mi =>
        element_at(typedLit(lutRow(qv, mi)), col(s"_c$mi") + 1))
        .reduceLeft(_ + _)
      struct(lit(qid).as("query_id"), adc.as("adc_scaled"))
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("adc_scaled"), col("doc_id"))
    coded
      .select(col(idCol).as("doc_id"), explode(array(perQuery: _*)).as("_q"))
      .select(col("_q.query_id").as("query_id"), col("doc_id"),
        col("_q.adc_scaled").as("adc_scaled"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** IVF-ADC: the production ANN layout (FAISS's IndexIVFPQ default) —
    * a coarse IVF partition bounds WHICH vectors are scanned, the PQ
    * asymmetric-distance LUT bounds the COST per scanned vector. Each
    * query probes its `nProbe` nearest coarse cells and ADC-scans only
    * those cells' members; at 100 TB this is the difference between
    * touching the corpus and touching nProbe/K of it, with 1-byte-per-
    * subquantizer reads instead of full vectors. Composition of the
    * gated pieces ([[graft.ops.IvfIndex]] q37, [[adcTopK]] q124): the
    * same deterministic seeded coarse centroids, the same first-16 PQ
    * codebook, pure-integer ADC. Per-query LUTs ship as map literals
    * keyed by query id (≤256 queries · m·16 longs — broadcast-tiny), the
    * probe table broadcasts, and the only shuffle is the per-query top-k
    * window over candidate rows.
    */
  def ivfAdcTopK(df: DataFrame, idCol: String, vecCol: String,
      pqCents: Array[Array[Array[Long]]],
      ivfCents: Array[(Long, Seq[Double])], nProbe: Int,
      queryPred: Column, k: Int): DataFrame = {
    val m = pqCents.length
    val sub = pqCents(0)(0).length
    val queries = df.filter(queryPred && col(vecCol).isNotNull)
      .orderBy(col(idCol))
      .select(col(idCol).cast("long"), Similarity.scaled(col(vecCol)).as("_s"))
      .limit(257).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    require(queries.nonEmpty && queries.length <= 256,
      s"query slice must be 1..256 vectors, got ${queries.length}")
    def lutRow(qv: Array[Long], mi: Int): Seq[Long] =
      pqCents(mi).toSeq.map { cv =>
        var acc = 0L; var j = 0
        while (j < sub) {
          val d = qv(mi * sub + j) - cv(j); acc += d * d; j += 1
        }
        acc
      }
    // codedParts projects the vector away, so IVF-assign on the ORIGINAL
    // frame and join the cell label back on the id
    val (withSubs, parts) = codedParts(df, idCol, vecCol, pqCents)
    val cells = IvfIndex.assignWith(df, vecCol, ivfCents)
      .select(col(idCol).cast("long").as("doc_id"), col("_centroid"))
    val coded = withSubs.select(
      col(idCol).cast("long").as("doc_id") +:
        (0 until m).map(mi => parts(mi).getField("code").as(s"_c$mi")): _*)
      .join(cells, "doc_id")
    val probes = df.filter(queryPred)
      .select(col(idCol).cast("long").as("query_id"),
        explode(IvfIndex.probeList(col(vecCol).cast("array<double>"),
          ivfCents, nProbe)).as("_centroid"))
    val lutMaps = (0 until m).map(mi =>
      queries.map { case (qid, qv) => qid -> lutRow(qv, mi) }.toMap)
    val adc = (0 until m).map(mi =>
      element_at(element_at(typedLit(lutMaps(mi)), col("query_id")),
        col(s"_c$mi") + 1)).reduceLeft(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("adc_scaled"), col("doc_id"))
    coded.join(broadcast(probes), "_centroid")
      .filter(col("doc_id") =!= col("query_id"))
      .withColumn("adc_scaled", adc)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("adc_scaled"), col("rank"))
  }
}
