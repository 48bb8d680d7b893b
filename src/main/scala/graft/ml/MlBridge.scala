package graft.ml

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** MLlib bridge (the BASELINE "DataFrame transformations + MLlib"
  * approach): learned components that plug into the native operators.
  *
  *  - KMeans-trained IVF centroids: `org.apache.spark.ml.clustering.KMeans`
  *    replaces the deterministic hash-sample in [[graft.ops.IvfIndex]] —
  *    learned centroids track the data distribution, so inverted lists are
  *    balanced and recall per probed list is higher. The output feeds
  *    `IvfIndex.searchTopKWith` unchanged (assignment/probing/re-rank stay
  *    the native codegen path).
  *  - MinHashLSH candidate pairs: the `ml.feature` pipeline (binary
  *    HashingTF → MinHashLSH.approxSimilarityJoin) as an alternative
  *    candidate generator to [[graft.ops.Dedup.minhashLshPairs]].
  *
  * Scale notes: KMeans training cost is O(iterations × k × corpus) — at
  * 100 TB train on a deterministic SAMPLE (hash-bounded, like q51's
  * stratified sampler) and assign the full corpus with the fitted centers
  * (one map pass). approxSimilarityJoin is an explode-by-hash-table +
  * equi-join on (table, band hash) — the same shuffle shape as the native
  * LSH path. MLlib outputs are seed-deterministic but depend on MLlib
  * internals (init sampling, float reduction order), so they are gated
  * rows-only, with recall proven against exact brute force in MlBridgeSpec.
  */
object MlBridge {

  /** Train KMeans on the vector column; return centers in IvfIndex's
    * centroid shape (ids 0..k-1 in MLlib center order).
    */
  def kmeansCentroids(df: DataFrame, vecCol: String, k: Int, seed: Long,
      maxIter: Int = 10): Array[(Long, Seq[Double])] = {
    val data = df.select(array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    // MLlib's own undersized-input failures are opaque executor-side
    // artifacts ("Nothing has been added to this summarizer" on empty, an
    // ArrayIndexOutOfBounds in KMeansAggregator when 0 < n < k) — refuse
    // clearly instead. BOUNDED probe (round-12 advice): limit(k) reads at
    // most k rows, so detecting n < k never costs a full pass over a
    // production-scale training set the way a bare count() did.
    val n = data.limit(k).count()
    require(n >= k,
      s"kmeansCentroids needs at least k=$k training vectors, got $n")
    val model = new KMeans()
      .setK(k).setSeed(seed).setMaxIter(maxIter).setFeaturesCol("features")
      .fit(data)
    model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i.toLong, c.toArray.toSeq)
    }
  }

  /** IVF ANN search with KMeans-learned centroids: MLlib trains, the
    * native inverted-list search executes.
    */
  def ivfTopKKMeans(df: DataFrame, idCol: String, vecCol: String,
      queryPred: org.apache.spark.sql.Column, k: Int, nCentroids: Int,
      nProbe: Int, seed: Long): DataFrame = {
    val cents = kmeansCentroids(df, vecCol, nCentroids, seed)
    graft.ops.IvfIndex.searchTopKWith(df, idCol, vecCol, queryPred, k, cents, nProbe)
  }

  /** Euclidean ANN candidates via ml.feature BucketedRandomProjectionLSH
    * (SURVEY §7.1.9): random-projection bucketing, approxSimilarityJoin at
    * `maxL2Dist`. Seed-deterministic; the native sign-LSH / IVF paths stay
    * the oracle-checked surfaces.
    */
  def brpNeighbors(df: DataFrame, idCol: String, vecCol: String,
      bucketLength: Double, numHashTables: Int, maxL2Dist: Double,
      seed: Long): DataFrame = {
    val spread = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("id"),
        array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val brp = new org.apache.spark.ml.feature.BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables).setSeed(seed)
    val model = brp.fit(spread)
    model.approxSimilarityJoin(spread, spread, maxL2Dist, "l2_dist")
      .where(col("datasetA.id") < col("datasetB.id"))
      .select(col("datasetA.id").as("id_a"), col("datasetB.id").as("id_b"),
        col("l2_dist"))
  }

  /** Near-dup candidate pairs via the ml.feature MinHashLSH pipeline:
    * whitespace tokens → binary HashingTF (2^18 features) → MinHash
    * signatures → approxSimilarityJoin at `maxJaccardDist` (MLlib's
    * distance = 1 − Jaccard on the hashed feature SETS).
    */
  def minhashLshCandidates(docs: DataFrame, idCol: String, textCol: String,
      numHashTables: Int, maxJaccardDist: Double, seed: Long,
      numFeatures: Int = 1 << 18): DataFrame = {
    val spread = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("toks"))
    val tf = new HashingTF()
      .setInputCol("toks").setOutputCol("features")
      .setNumFeatures(numFeatures).setBinary(true)
    val feats = tf.transform(spread)
    val lsh = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(seed)
    val model = lsh.fit(feats)
    model.approxSimilarityJoin(feats, feats, maxJaccardDist, "jaccard_dist")
      .where(col("datasetA.id") < col("datasetB.id"))
      .select(col("datasetA.id").as("id_a"), col("datasetB.id").as("id_b"),
        col("jaccard_dist"))
  }
}
