package graft

import org.apache.spark.sql.functions._
import graft.ml.MlBridge
import graft.functions.TextAnalysis
import graft.ops.{Dedup, IvfIndex, Similarity}

/** MLlib-bridge tests: learned components must plug into the native
  * operators and hold recall against exact brute force.
  */
class MlBridgeSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("KMeans centroids have the right shape and are seed-deterministic") {
    val emb = Tables.embeddings(spark, sfDir)
    val c1 = MlBridge.kmeansCentroids(emb, "embedding", 8, seed = 42L)
    val c2 = MlBridge.kmeansCentroids(emb, "embedding", 8, seed = 42L)
    assert(c1.length === 8)
    assert(c1.forall(_._2.size === 64))
    assert(c1.map(_._2) === c2.map(_._2)) // same seed → same centers
  }

  test("KMeans-IVF recall matches or beats hash-sampled-centroid IVF") {
    val emb = Tables.embeddings(spark, sfDir)
    val queryPred = col("vec_id") % 50 === 0
    val topExact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", queryPred, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val topKm = MlBridge.ivfTopKKMeans(emb, "vec_id", "embedding", queryPred,
      k = 1, nCentroids = 8, nProbe = 4, seed = 42L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(topKm.nonEmpty)
    val agree = topExact.keys.count(k => topKm.get(k).contains(topExact(k)))
    // learned centroids, 4 of 8 lists probed: at least half the exact
    // top-1s recalled (the hash-centroid baseline bound from StreamingSpec)
    assert(agree * 2 >= topExact.size, s"KMeans-IVF recall too low: $agree/${topExact.size}")
  }

  test("BucketedRandomProjectionLSH finds the truly-close embedding pairs") {
    val emb = Tables.embeddings(spark, sfDir)
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def l2(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    // ground truth: the 20 closest pairs by exact L2 (200 vectors → 19,900 pairs)
    val exact = (for {
      i <- vecs.indices; j <- (i + 1) until vecs.length
    } yield ((vecs(i)._1.min(vecs(j)._1), vecs(i)._1.max(vecs(j)._1)),
        l2(vecs(i)._2, vecs(j)._2)))
      .sortBy(_._2).take(20)
    val maxDist = exact.last._2
    val cand = MlBridge.brpNeighbors(emb, "vec_id", "embedding",
      bucketLength = maxDist, numHashTables = 6, maxL2Dist = maxDist * 1.001,
      seed = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recalled = exact.count(p => cand.contains(p._1))
    assert(recalled * 5 >= exact.size * 4,
      s"BRP-LSH recall too low: $recalled/${exact.size}")
  }

  test("MLlib MinHashLSH finds the exact near-dup pairs (high recall)") {
    val docs = Tables.documents(spark, sfDir)
    // ground truth: exact token-set Jaccard >= 0.8 among same-lang docs
    val toks = docs.withColumn("_toks", array_distinct(TextAnalysis.tokens(col("text"))))
    val exact = Dedup.jaccardPairs(toks, "doc_id", "_toks", col("lang"), 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture must contain near-dup pairs")
    val candidates = MlBridge.minhashLshCandidates(docs, "doc_id", "text",
      numHashTables = 6, maxJaccardDist = 0.4, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recalled = exact.count(candidates.contains)
    // 6 hash tables at dist<=0.4: expect >= 80% of true >=0.8-Jaccard pairs
    assert(recalled * 5 >= exact.size * 4,
      s"MinHashLSH recall too low: $recalled/${exact.size}")
  }
}
