package graft

import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis
import graft.ops.{Corpus, Dedup}

/** Tests for corpus-curation operators: repetition signals, inverted index,
  * PMI collocations, edit-distance pairs, distribution drift.
  */
class CorpusSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "a", "the cat sat on the mat the cat"),
    (1L, "a", "dogs bark dogs bark dogs bark"),
    (2L, "b", "entirely unique words everywhere here today"),
    (3L, "b", "the cat sat on the mat the cat"),
    (4L, "b", "the cat sat on the mat the rat")
  ).toDF("doc_id", "source", "text")

  test("modeCount equals brute-force mode multiplicity; empty array is 0") {
    val rows = Seq(
      Seq("a", "b", "a", "c", "a"),
      Seq("x"),
      Seq.empty[String],
      Seq("z", "z", "y", "y")
    ).toDF("arr")
      .select(TextAnalysis.modeCount(col("arr")).as("m"))
      .collect().map(_.getLong(0)).toSeq
    assert(rows === Seq(3L, 1L, 0L, 2L))
  }

  test("bigrams are adjacent in-order pairs; short docs yield empty") {
    val out = Seq(Seq("a", "b", "c"), Seq("solo"), Seq.empty[String])
      .toDF("toks")
      .select(TextAnalysis.bigrams(col("toks")).as("b"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) === Seq("a b", "b c"))
    assert(out(1).isEmpty && out(2).isEmpty)
  }

  test("inverted index: df and sorted postings match a brute-force build") {
    val idx = Corpus.invertedIndex(docs, "doc_id", "text", minDf = 2L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[Long](2)))).toMap
    // "the" appears in docs 0, 3, 4; "cat" in 0, 3, 4; "bark" only doc 1 (df 1, filtered)
    assert(idx("the") === ((3L, Seq(0L, 3L, 4L))))
    assert(idx("cat") === ((3L, Seq(0L, 3L, 4L))))
    assert(!idx.contains("bark"))
    assert(!idx.contains("unique"))
    // df counts DOCUMENTS, not occurrences: "the" occurs 3x in doc 0 but df is 3 not 9
  }

  test("inverted index caps postings at maxPostings but keeps df exact") {
    val many = (0L until 20L).map(i => (i, s"common word$i")).toDF("doc_id", "text")
    val idx = Corpus.invertedIndex(many, "doc_id", "text", minDf = 1L, maxPostings = 5)
      .where(col("term") === "common").head()
    assert(idx.getLong(1) === 20L)
    assert(idx.getSeq[Long](2) === Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("inverted index: NULL doc_ids never consume cap slots (nulls rank last)") {
    // round-14 advice: ascending NULLS FIRST would hand null ids the first
    // rank slots and collect_list then drops them — a capped term silently
    // lost up to #null REAL postings under the null sweep shape
    val many = ((0L until 20L).map(i => (Some(i), "common")) ++
      (0 until 10).map(_ => (None: Option[Long], "common")))
      .toDF("doc_id", "text")
    val idx = Corpus.invertedIndex(many, "doc_id", "text", minDf = 1L,
        maxPostings = 5)
      .where(col("term") === "common").head()
    assert(idx.getLong(1) === 30L) // df still counts every row
    assert(idx.getSeq[Long](2) === Seq(0L, 1L, 2L, 3L, 4L)) // all-real prefix
  }

  test("PMI collocations rank the always-adjacent pair highest") {
    val c = Corpus.pmiCollocations(docs, "text", minCount = 2L, topK = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(4)))
    // "dogs bark" occurs 3x and the two words occur ONLY together (plus one
    // "bark dogs" back-pair) — maximal association, must rank first
    assert(c.head._1 === "dogs bark")
    assert(c.head._2 === 3L)
    // scores are positive and non-increasing
    assert(c.map(_._3).toSeq === c.map(_._3).sortBy(-_).toSeq)
    assert(c.forall(_._3 > 0.0))
  }

  test("containment pairs: excerpt inside superset found at 1.0, jaccard would miss it") {
    import org.apache.spark.sql.functions.{array_distinct, lit}
    val data = Seq(
      (0L, "the cat sat on the mat"),                        // 5 distinct tokens
      (1L, "the cat sat on the mat and then a dog came by to watch it all day"), // superset
      (2L, "entirely different words here")
    ).toDF("doc_id", "text")
      .withColumn("_toks", array_distinct(TextAnalysis.tokens(col("text"))))
    val pairs = Dedup.containmentPairs(data, "doc_id", "_toks", lit(1), 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.keySet === Set((0L, 1L)))
    assert(pairs((0L, 1L)) === 1.0)
    // symmetric jaccard on the same pair is far below 0.9
    val jac = Dedup.jaccardPairs(data, "doc_id", "_toks", lit(1), 0.9)
      .collect()
    assert(!jac.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1L))
  }

  test("edit-distance pairs match a brute-force threshold join") {
    val pairs = Dedup.editDistancePairs(docs, "doc_id", "text",
      substring(col("text"), 1, 10), maxDist = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force within the same 10-char-prefix blocks
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val brute = (for {
      (ia, ta) <- rows; (ib, tb) <- rows
      if ia < ib && ta.take(10) == tb.take(10)
      d = levenshteinRef(ta, tb) if d <= 8
    } yield (ia, ib, d)).toSet
    assert(pairs === brute)
    assert(pairs.contains((0L, 3L, 0)))       // exact dup
    assert(pairs.exists(p => p._1 == 0L && p._2 == 4L)) // mat/rat edit
  }

  test("containment block key tolerates token-less docs (no ANSI array-index raise)") {
    import spark.implicits._
    // round-13 array-index audit: the q75 shape — first-token block key
    // over a corpus containing a punctuation-only doc (tokens = []) must
    // compute, with the token-less doc contributing no pairs
    val data = Seq(
      (0L, "the cat sat"), (1L, "the cat sat"), (2L, "?!... --- ..."))
      .toDF("doc_id", "text")
      .withColumn("_toks", array_distinct(TextAnalysis.tokens(col("text"))))
      .withColumn("_tok1", when(size(TextAnalysis.tokens(col("text"))) >= 1,
        element_at(TextAnalysis.tokens(col("text")), 1)))
    val pairs = Dedup.containmentPairs(data, "doc_id", "_toks",
        concat_ws("|", lit("en"), col("_tok1")), 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 1L)))
  }

  test("edit-distance domain guard: over-long text refuses with routing; override admits it") {
    import spark.implicits._
    val long = Seq((0L, "x" * 5000), (1L, "x" * 5000)).toDF("doc_id", "text")
    // default maxTextLen=4096: refuse loudly, message routes to
    // jaccard/minhash (round-12 verdict: the measured 61 s/pair tail must
    // be unreachable by accident, not just documented)
    val e = intercept[Exception] {
      Dedup.editDistancePairs(long, "doc_id", "text", lit(1), maxDist = 2).count()
    }
    val msg = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .take(10).flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(msg.contains("maxTextLen") && msg.contains("minhash"), msg)
    // explicit override: the caller owns the cost, pairs still correct
    val forced = Dedup.editDistancePairs(long, "doc_id", "text", lit(1),
      maxDist = 2, maxTextLen = 8192)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(forced === Set((0L, 1L, 0)))
    // null texts still pass the guard and drop at the length prefilter
    val withNull = Seq((0L, "abc"), (1L, "abd"), (2L, null))
      .toDF("doc_id", "text")
    val p = Dedup.editDistancePairs(withNull, "doc_id", "text", lit(1), maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(p === Set((0L, 1L, 1)))
  }

  test("drift TVD: identical-source corpus has 0; disjoint vocab source is high") {
    val same = Seq((0L, "a", "x y z"), (1L, "b", "x y z")).toDF("doc_id", "source", "text")
    val tvdSame = Corpus.groupDriftTvd(same, "source", "text")
      .collect().map(_.getDouble(2))
    assert(tvdSame.forall(math.abs(_) < 1e-12))

    val split = Seq((0L, "a", "x x x"), (1L, "b", "y y y")).toDF("doc_id", "source", "text")
    val tvdSplit = Corpus.groupDriftTvd(split, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // each source holds half the corpus with disjoint vocab: TVD = 1/2
    assert(math.abs(tvdSplit("a") - 0.5) < 1e-12)
    assert(math.abs(tvdSplit("b") - 0.5) < 1e-12)
  }

  test("drift TVD is within [0, 1] and deterministic across repartitioning") {
    val t1 = Corpus.groupDriftTvd(docs, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val t2 = Corpus.groupDriftTvd(docs.repartition(7), "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(t1 === t2)
    assert(t1.values.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("vocabCoverage: OOV rate against a hand vocabulary, deterministic tie cutoff") {
    // counts: a=4, b=3, c=2, d=2, e=1 — vocabSize=3 must cut at (2,'c')
    // (count desc, term asc), so d and e are OOV
    val docs = Seq(
      (1L, "a a b c d"),
      (2L, "a b c d e"),
      (3L, "a b"),
      (4L, "")
    ).toDF("doc_id", "text")
    val out = Corpus.vocabCoverage(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(1L) === ((5L, 1L, 0.2)))     // d OOV
    assert(out(2L) === ((5L, 2L, 0.4)))     // d, e OOV
    assert(out(3L) === ((2L, 0L, 0.0)))
    assert(!out.contains(4L))               // zero-token doc excluded
  }

  test("stupidBackoff: all three score paths match the hand reference") {
    val docs = Seq(
      (1L, true, "a b c"),  // LM slice
      (2L, true, "a b a"),  // LM slice
      (3L, false, "a b z"), // seen bigram + unseen-unigram backoff
      (4L, false, "c a")    // unseen bigram, seen unigram backoff
    ).toDF("doc_id", "lm", "text")
    val out = graft.ops.Scoring.stupidBackoff(docs, "doc_id",
        TextAnalysis.tokens(col("text")), col("lm"), 0.4)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // LM: bigrams "a b"=2 "b c"=1 "b a"=1; unigrams a=3 b=2 c=1, N=6
    def micro(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    def mean(ss: Seq[Long]) =
      math.floor(ss.sum.toDouble / 1e6 / ss.size * 1e6 + 0.5) / 1e6
    val sAB = micro(math.log(2.0 / 3)) // seen: C12/C(a)
    val sBC = micro(math.log(1.0 / 2))
    val sBZ = micro(math.log(0.4 / 6)) // z unseen anywhere in LM
    val sCA = micro(math.log(0.4 * 3 / 6)) // bigram unseen, a seen
    assert(out(0) === ((1L, 2L, mean(Seq(sAB, sBC)))))
    assert(out(2) === ((3L, 2L, mean(Seq(sAB, sBZ)))))
    assert(out(3) === ((4L, 1L, mean(Seq(sCA)))))
    // unseen-unigram leaf scores strictly below the seen-unigram backoff
    assert(sBZ < sCA)
  }

  /** Classic DP edit distance, the test oracle. */
  private def levenshteinRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val cost = if (a(i - 1) == b(j - 1)) 0 else 1
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1), d(i - 1)(j - 1) + cost)
    }
    d(a.length)(b.length)
  }
}
