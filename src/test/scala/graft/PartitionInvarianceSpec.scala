package graft

/** The repo-wide determinism claim, tested directly: gate results must be
  * IDENTICAL under different shuffle-partition counts (different
  * aggregation trees, different window partition placement, different
  * task boundaries). Each probed gate runs in two isolated sessions —
  * 5 vs 32 shuffle partitions — over sf0.001 and must produce the same
  * multiset of rows. The roster deliberately stresses the hazard
  * classes: seeded hashing (q07), LSH band joins + pair dedup (q27),
  * iterative closure (q49), integer PageRank (q76), per-cluster
  * best-score windows with ties (q97), inverted-index similarity join
  * (q103), and the sliced sliding window (q172).
  */
class PartitionInvarianceSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private val gates = Seq("q07_hash_split", "q27_minhash_lsh",
    "q49_dedup_clusters", "q76_pagerank", "q97_keep_best",
    "q103_sparse_cosine", "q172_sliding_window")

  test("gate results are invariant to the shuffle partition count") {
    val s5 = spark.newSession()
    s5.conf.set("spark.sql.shuffle.partitions", "5")
    val s32 = spark.newSession()
    s32.conf.set("spark.sql.shuffle.partitions", "32")
    gates.foreach { g =>
      val fn = SparkEntry.queries(g)
      val a = fn(s5, dir).collect().map(_.toString).sorted.toSeq
      val b = fn(s32, dir).collect().map(_.toString).sorted.toSeq
      assert(a.nonEmpty, s"$g produced no rows")
      assert(a === b, s"$g diverges across shuffle partition counts")
      spark.catalog.clearCache()
    }
  }
}
