package graft

import graft.ops.Corpus

/** Heaps-curve decomposition against brute-force prefix distinct-counts:
  * the bucket contract is prefix i = docs with d·points < i·n.
  */
class VocabGrowthSpec extends SparkSuite {

  test("vocabGrowth equals per-prefix brute force on a 10-doc corpus") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c"), (1L, "a b"), (2L, "d"), (3L, "a d e"), (4L, ""),
      (5L, "f f f"), (6L, "a"), (7L, "g h"), (8L, "b g"), (9L, "i"))
    val df = docs.toDF("doc_id", "text")
    val points = 4
    val n = 10L
    def toks(t: String) = t.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
    val expected = (1 to points).map { i =>
      val prefix = docs.filter { case (d, _) => d * points < i * n }
      val nTokens = prefix.map(d => toks(d._2).size.toLong).sum
      val vocab = prefix.flatMap(d => toks(d._2)).distinct.size.toLong
      (i.toLong, prefix.size.toLong, nTokens, vocab)
    }
    val got = Corpus.vocabGrowth(df, "doc_id", "text", points)
      .orderBy("i").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
  }

  test("last checkpoint covers the whole corpus") {
    import spark.implicits._
    val df = Seq((0L, "x y"), (1L, "y z")).toDF("doc_id", "text")
    val got = Corpus.vocabGrowth(df, "doc_id", "text", 8)
      .orderBy("i").collect()
    assert(got.last.getLong(1) == 2L)   // prefix_docs = n at i = points
    assert(got.last.getLong(2) == 4L)   // all tokens
    assert(got.last.getLong(3) == 3L)   // {x, y, z}
  }

  test("sparse or non-0-based ids are rejected, not silently inflated") {
    import spark.implicits._
    // ids {0, 7}: the old behavior reported prefix_docs up to 8 for a
    // 2-doc corpus — the dense-id precondition is now asserted up front
    val sparse = Seq((0L, "x y"), (7L, "y z")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Corpus.vocabGrowth(sparse, "doc_id", "text", 4)
    }
    assert(e.getMessage.contains("dense 0-based"))
    val oneBased = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Corpus.vocabGrowth(oneBased, "doc_id", "text", 2)
    }
    // duplicate+gap set {0, 0, 2}: min=0 and count=max+1 both hold, so
    // only the distinctness assert catches it (round-12 advice)
    val dupGap = Seq((0L, "x"), (0L, "y"), (2L, "z")).toDF("doc_id", "text")
    val e2 = intercept[IllegalArgumentException] {
      Corpus.vocabGrowth(dupGap, "doc_id", "text", 2)
    }
    assert(e2.getMessage.contains("UNIQUE"))
  }

  test("empty corpus fails loudly instead of NPE-ing on the null max") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Corpus.vocabGrowth(empty, "doc_id", "text", 4)
    }
    assert(e.getMessage.contains("empty corpus"))
  }
}
