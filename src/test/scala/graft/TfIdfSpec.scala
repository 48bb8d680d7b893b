package graft

import org.apache.spark.sql.functions._
import graft.ops.TfIdf

/** TF-IDF and heavy hitters on a corpus small enough to score by hand.
  * idf = ln((N+1)/(df+1)) + 1 rounded to 6 decimals, score = tf · idf.
  */
class TfIdfSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a a b"),
    (2L, "a c"),
    (3L, "b b b d")).toDF("doc_id", "text")

  private val toks = split(col("text"), " ")

  test("topTerms scores and ranks by (score desc, term)") {
    val out = TfIdf.topTerms(docs, "doc_id", toks, 2)
      .orderBy("doc_id", "rank")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getInt(5)))
    // N=3: idf(df=2) = ln(4/3)+1 = 1.287682 ; idf(df=1) = ln(2)+1 = 1.693147
    assert(out.toSeq == Seq(
      (1L, "a", 2L, 2L, 2.575364, 1),
      (1L, "b", 1L, 2L, 1.287682, 2),
      (2L, "c", 1L, 1L, 1.693147, 1),
      (2L, "a", 1L, 2L, 1.287682, 2),
      (3L, "b", 3L, 2L, 3.863046, 1),
      (3L, "d", 1L, 1L, 1.693147, 2)))
  }

  test("sparseCosinePairs: exact cosine on kept terms, stop terms excluded") {
    // "the" appears in all 4 docs → df=4 > cap=ceil(4·750/1000)=3 →
    // excluded from the similarity space; docs 10/11 share (x:2, y:1)
    // exactly → sim 1.0; doc 12 shares only x; doc 13 shares nothing kept.
    val corpus = Seq(
      (10L, "the x x y"),
      (11L, "the x x y"),
      (12L, "the x z z"),
      (13L, "the q")).toDF("doc_id", "text")
    val out = TfIdf.sparseCosinePairs(corpus, "doc_id", toks,
        maxDfPerMille = 750, minSim = 0.3)
      .orderBy("id_a", "id_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // dot(10,11) = 2*2+1*1 = 5, norms = sqrt(5) → sim 1.0
    // dot(10,12) = 2*1 = 2, norms sqrt(5)*sqrt(5) → 0.4
    assert(out.toSeq == Seq(
      (10L, 11L, 1.0),
      (10L, 12L, 0.4),
      (11L, 12L, 0.4)))
  }

  test("heavyHitters orders by freq desc then term") {
    val out = TfIdf.heavyHitters(docs, "doc_id", toks, 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("b", 4L, 2L), ("a", 3L, 2L), ("c", 1L, 1L)))
  }
}
