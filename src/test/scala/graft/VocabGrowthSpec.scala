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
    val df = Seq((0L, "x y"), (7L, "y z")).toDF("doc_id", "text")
    val got = Corpus.vocabGrowth(df, "doc_id", "text", 8)
      .orderBy("i").collect()
    assert(got.last.getLong(1) == 8L)   // prefix_docs = n at i = points
    assert(got.last.getLong(2) == 4L)   // all tokens
    assert(got.last.getLong(3) == 3L)   // {x, y, z}
  }
}
