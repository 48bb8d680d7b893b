package graft

import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis
import graft.ops.{Curation, Scoring}

/** Curation + scoring ops on corpora small enough to compute by hand. */
class CurationSpec extends SparkSuite {
  import spark.implicits._

  private val toks = TextAnalysis.tokens(col("text"))

  test("decontaminate flags docs sharing an n-gram with the benchmark") {
    val docs = Seq(
      (1L, "the quick brown fox", true),   // benchmark
      (2L, "a quick brown fox runs", false), // shares "quick brown fox"? n=3
      (3L, "totally different words here", false),
      (4L, "the quick brown dog", false))  // shares "the quick brown"
      .toDF("doc_id", "text", "bench")
    val out = Curation.decontaminate(docs, "doc_id",
        graft.functions.WordShinglesExpr(col("text"), 3), col("bench"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // doc 2 shares {quick brown fox}; doc 4 shares {the quick brown};
    // doc 3 shares nothing and must be absent
    assert(out.toSeq == Seq((2L, 1L), (4L, 1L)))
  }

  test("duplicateSpans counts spans occurring in >1 doc") {
    val docs = Seq(
      (1L, "a b c d"),   // spans(2): {a b, b c, c d}
      (2L, "b c d e"),   // spans(2): {b c, c d, d e}
      (3L, "x y z w"))   // disjoint
      .toDF("doc_id", "text")
    val out = Curation.duplicateSpans(docs, "doc_id",
        graft.functions.WordShinglesExpr(col("text"), 2))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 3L, 2L, 0.666667), // b c, c d duplicated
      (2L, 3L, 2L, 0.666667),
      (3L, 3L, 0L, 0.0)))
  }

  test("tokenBudgetSelect takes best-score docs until the budget") {
    val docs = Seq(
      (1L, 0.9, 40L), (2L, 0.8, 40L), (3L, 0.7, 40L), (4L, 0.6, 40L))
      .toDF("doc_id", "score", "tokens")
    val out = Curation.tokenBudgetSelect(docs, "doc_id", col("score"),
        col("tokens"), 100L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4)))
    // cum_before: doc1=0, doc2=40, doc3=80, doc4=120 → first three selected
    assert(out.toSeq == Seq((1L, 0L, true), (2L, 40L, true),
      (3L, 80L, true), (4L, 120L, false)))
  }

  test("tokenBudgetSelect breaks score ties by id (total order)") {
    val docs = Seq((5L, 0.5, 10L), (2L, 0.5, 10L), (9L, 0.5, 10L))
      .toDF("doc_id", "score", "tokens")
    val out = Curation.tokenBudgetSelect(docs, "doc_id", col("score"),
        col("tokens"), 15L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4)))
    assert(out.toSeq == Seq((2L, 0L, true), (5L, 10L, true), (9L, 20L, false)))
  }

  test("domainMixture: sqrt-temperature weights sum to ~1 and favor small domains") {
    val docs = Seq(("a", 90L), ("b", 10L)).toDF("source", "toks_in")
    val out = Curation.domainMixture(docs, "source", col("toks_in"))
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // share: 0.9/0.1 → sqrt: 0.948683/0.316228 → micros 948683/316228
    // weights: 948683/1264911 = 0.75 (rounded 0.750000), 316228/1264911
    assert(out.map(_._3).toSeq == Seq(0.9, 0.1))
    assert(math.abs(out.map(_._4).sum - 1.0) < 0.000002)
    assert(out(1)._4 > 0.1 && out(0)._4 < 0.9) // temperature flattens
  }

  test("qualityBands: percent_rank and decile bands per group") {
    val docs = Seq(
      (1L, "g", 0.1), (2L, "g", 0.2), (3L, "g", 0.3), (4L, "g", 0.4),
      (5L, "g", 0.5), (6L, "h", 0.9))
      .toDF("doc_id", "grp", "q")
    val out = Curation.qualityBands(docs, "doc_id", "grp", col("q"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(3), r.getLong(4)))
    // group g: pr = k/4 → 0, .25, .5, .75, 1; bands 0,2,5,7,9
    assert(out.toSeq == Seq((1L, 0.0, 0L), (2L, 0.25, 2L), (3L, 0.5, 5L),
      (4L, 0.75, 7L), (5L, 1.0, 9L), (6L, 0.0, 0L)))
  }

  test("slidingChunks windows with overlap and clamps the tail") {
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6"), (2L, "a b")).toDF("doc_id", "text")
    val out = Curation.slidingChunks(docs, "doc_id", toks, 4, 3)
      .orderBy("doc_id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc1 len 7: nc = floor((7-4+2)/3)+1 = floor(5/3)+1 = 2 →
    //   [t0..t3] and [t3..t6]; doc2 len 2 → one short chunk
    assert(out.toSeq == Seq((1L, 0L, 4L), (1L, 1L, 4L), (2L, 0L, 2L)))
  }

  test("slidingChunks chunk fingerprint covers the right tokens") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val out = Curation.slidingChunks(docs, "doc_id", toks, 3, 2)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getLong(1), r.getString(3)))
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    // windows: [a b c], [c d e], [e]  (nc = floor((5-3+1)/2)+1 = 2 → wait:
    // (5-3+2-1)=3, floor(3/2)=1, +1 = 2 chunks: [a b c], [c d e]
    assert(out.toSeq == Seq((0L, md5hex("a b c")), (1L, md5hex("c d e"))))
  }

  test("bm25 ranks the doc saturated in a rare term first") {
    val docs = Seq(
      (1L, "x x x y"),
      (2L, "x y z z"),
      (3L, "p q r s"))
      .toDF("doc_id", "text")
    val out = Scoring.bm25(docs, "doc_id", toks, Seq("x", "z"), k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // z is rarer (df=1) than x (df=2); doc2 has both terms → top score;
    // doc3 matches nothing and is absent
    assert(out.map(_._1).toSeq == Seq(2L, 1L))
    assert(out.forall(_._2 > 0.0))
  }

  test("unigramLogProb: common-token docs score higher than rare-token docs") {
    val docs = Seq(
      (1L, "a a a a"), // all common
      (2L, "a a q r")) // two hapaxes
      .toDF("doc_id", "text")
    val out = Scoring.unigramLogProb(docs, "doc_id", toks)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // p(a) = 6/8, p(q) = p(r) = 1/8
    val lpA = math.floor(math.log(6.0 / 8.0) * 1e6 + 0.5) / 1e6
    val lpQ = math.floor(math.log(1.0 / 8.0) * 1e6 + 0.5) / 1e6
    assert(out(0)._2 == 4L && out(1)._2 == 4L)
    assert(out(0)._3 > out(1)._3)
    val exp1 = math.floor((4 * lpA * 1e6) / 1e6 / 4.0 * 1e6 + 0.5) / 1e6
    assert(math.abs(out(0)._3 - exp1) < 1e-9)
    val exp2 = math.floor(((2 * lpA + 2 * lpQ) * 1e6) / 1e6 / 4.0 * 1e6 + 0.5) / 1e6
    assert(math.abs(out(1)._3 - exp2) < 1e-9)
  }
}
