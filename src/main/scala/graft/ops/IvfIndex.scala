package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** IVF (inverted-file) approximate nearest neighbour over an embedding
  * column — the coarse-quantizer scale path next to
  * [[Similarity.signLshTopK]].
  *
  * Deterministic pipeline (no RNG — centroid choice is a seeded hash
  * sample, so index builds are reproducible):
  *  1. `centroids`: pick k seed vectors by smallest seeded hash of the id
  *     (a deterministic uniform sample), collect to the driver (k vectors,
  *     tiny) and broadcast as literals;
  *  2. `assign`: each vector joins its nearest centroid (argmin cosine
  *     distance against the broadcast centroid array — a map-only pass);
  *  3. `searchTopK`: queries probe their `nProbe` nearest centroid lists
  *     and re-rank candidates with the exact scaled-integer cosine.
  *
  * At 100 TB: the index build is one map pass + one small aggregation; a
  * search touches n·(nProbe/k) of the corpus via an equi-join on
  * centroid id instead of a cross product.
  */
object IvfIndex {

  /** Deterministic k-sample: the k ids with smallest seeded hash. */
  def pickCentroids(df: DataFrame, idCol: String, vecCol: String, k: Int,
      seed: String): Array[(Long, Seq[Double])] = {
    import graft.functions.Hashing
    // null embeddings can't anchor a centroid — skip them (round-12
    // null-payload sweep: getSeq on a null row NPE'd downstream)
    df.where(col(vecCol).isNotNull)
      .select(col(idCol), col(vecCol).cast("array<double>").as("_v"),
        Hashing.hash60(col(idCol).cast("string"), seed).as("_h"))
      .orderBy("_h")
      .limit(k)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
  }

  /** Cosine similarity of a vector column against one literal centroid
    * (native codegen dot — [[graft.functions.DotDouble]] folds in the same
    * index order as the interpreted aggregate it replaced).
    */
  private def cosToLit(v: Column, c: Seq[Double]): Column = {
    val lit = typedLit(c)
    val dot = graft.functions.Dot.double(v, lit)
    val nv = sqrt(graft.functions.Dot.double(v, v))
    val nc = math.sqrt(c.map(x => x * x).sum)
    // nc is a driver-side constant: an all-zero centroid (legal when a
    // zero embedding seeds the codebook) would make nv·nc = 0 INSIDE the
    // nv>0 branch and raise under ANSI — decide at plan time instead
    // (round-13 division audit); cosine against a zero vector is 0
    if (nc == 0.0) org.apache.spark.sql.functions.lit(0.0)
    else when(nv > 0, dot / (nv * nc)).otherwise(org.apache.spark.sql.functions.lit(0.0))
  }

  /** Nearest-centroid id expression against the broadcast centroid list
    * (argmax cosine, deterministic earliest-centroid tiebreak).
    *
    * Implemented as [[probeList]] with nProbe=1 — ONE array of scored
    * structs, each centroid cosine evaluated exactly once per row. A
    * `reduceLeft(when(b.sim > a.sim, b).otherwise(a))` chain is the
    * equivalent argmax but references the accumulator twice per step:
    * with no common-subexpression elimination in interpreted eval the
    * first centroid's cosine explodes into ~2^k copies (measured 121 s
    * for q37 at sf0.1 vs ~3 s for this form). array_sort's comparator
    * sort is stable, so ties keep hash order — same winner as the
    * strict-greater reduce.
    */
  def nearestCentroid(v: Column, centroids: Array[(Long, Seq[Double])]): Column =
    probeList(v, centroids, 1).getItem(0)

  /** Ranked centroid ids for a query vector (for nProbe > 1), as an array
    * column ordered by descending similarity.
    */
  def probeList(v: Column, centroids: Array[(Long, Seq[Double])], nProbe: Int): Column = {
    // A zero-centroid index has no probe order — and a bare `array()`
    // literal is VOID-typed, so downstream getField would die with an
    // opaque Catalyst error instead of this message (round-12 empty sweep)
    require(centroids.nonEmpty,
      "IVF probeList needs at least one centroid — empty corpus or k=0?")
    val scored = array(centroids.map { case (cid, cv) =>
      struct(cosToLit(v, cv).as("sim"), org.apache.spark.sql.functions.lit(cid).as("cid"))
    }: _*)
    slice(transform(array_sort(scored,
        (a, b) => when(a.getField("sim") > b.getField("sim"), -1)
          .when(a.getField("sim") < b.getField("sim"), 1).otherwise(0)),
      s => s.getField("cid")), 1, nProbe)
  }

  /** Assign every row to its nearest centroid from a caller-supplied list
    * (hash-sampled, KMeans-trained — any source): adds `_centroid`.
    */
  def assignWith(df: DataFrame, vecCol: String,
      cents: Array[(Long, Seq[Double])]): DataFrame = {
    val spread = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    spread.withColumn("_centroid",
      nearestCentroid(col(vecCol).cast("array<double>"), cents))
  }

  /** Build the index: adds `_centroid` to every row. */
  def assign(df: DataFrame, idCol: String, vecCol: String, k: Int,
      seed: String): (DataFrame, Array[(Long, Seq[Double])]) = {
    val cents = pickCentroids(df, idCol, vecCol, k, seed)
    (assignWith(df, vecCol, cents), cents)
  }

  /** ANN search: probe `nProbe` inverted lists, exact re-rank, top-k. */
  def searchTopK(df: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, nCentroids: Int, nProbe: Int,
      seed: String,
      maxQueryRows: Int = Similarity.DefaultMaxQueryRows): DataFrame =
    searchTopKWith(df, idCol, vecCol, queryPred, k,
      pickCentroids(df, idCol, vecCol, nCentroids, seed), nProbe,
      maxQueryRows)

  /** ANN search against caller-supplied centroids (e.g. MLlib KMeans —
    * see graft.ml.MlBridge): probe, exact re-rank, top-k.
    */
  def searchTopKWith(df: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, cents: Array[(Long, Seq[Double])],
      nProbe: Int,
      maxQueryRows: Int = Similarity.DefaultMaxQueryRows): DataFrame = {
    val assigned = assignWith(df, vecCol, cents)
    // no persist: the corpus feeds exactly one join, so a materialization
    // barrier would only add a pass (nearestCentroid evaluates each
    // centroid cosine once — see its scaladoc — so there is no
    // expression-duplication hazard to firewall here)
    val corpus = assigned.select(col("_centroid"),
      col(idCol).as("neighbor_id"), Similarity.scaled(col(vecCol)).as("_sn"))
      .withColumn("_nn", Similarity.normScaled(col("_sn")))
    // pre-explode cap: the broadcast build is at most nProbe× this
    // (nProbe is a caller literal, not data-driven)
    val queries = Similarity.guardQueryRows(assigned.filter(queryPred),
        maxQueryRows, "IvfIndex.searchTopK")
      .select(col(idCol).as("query_id"), Similarity.scaled(col(vecCol)).as("_sq"),
        explode(probeList(col(vecCol).cast("array<double>"), cents, nProbe))
          .as("_centroid"))
      .withColumn("_nq", Similarity.normScaled(col("_sq")))
    val sims = corpus.join(broadcast(queries), Seq("_centroid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim",
        graft.functions.Exact.roundPortable(
          Similarity.cosineFromNorms(col("_sq"), col("_sn"), col("_nq"), col("_nn")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }
}
