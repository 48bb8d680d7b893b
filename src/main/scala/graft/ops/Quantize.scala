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
    val rows = df.orderBy(col(idCol)).limit(k)
      .select(Similarity.scaled(col(vecCol)).as("_s"))
      .collect().map(_.getSeq[Long](0).toArray)
    require(rows.nonEmpty && rows(0).length % m == 0,
      s"need rows and dim divisible by m=$m")
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
    // parts is referenced by both output columns: the duplication is
    // LINEAR (two evaluations of an m·k-struct sort), not the 2^k reduce
    // blow-up — acceptable, and codegen subexpression elimination
    // collapses most of it
    withSubs.select(col(idCol),
      concat_ws("-", parts.map(_.getField("code").cast("string")): _*).as("codes"),
      parts.map(_.getField("dist")).reduceLeft(_ + _).as("qerr_scaled"))
  }
}
