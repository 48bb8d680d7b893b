package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Hashing, TextAnalysis}
import graft.ops.NaiveBayes

/** Trained-classifier gates: multinomial Naive Bayes language ID over the
  * documents table (train + held-out inference). The oracle replays the
  * exact same counts and scaled-int log arithmetic in DuckDB, so both the
  * model table and every per-document argmax hash-match.
  */
object ClassifierQueries {

  private val DuckToks =
    "list_filter(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' '), t -> len(t) > 0)"

  private def duckHash(seed: String, e: String): String =
    s"CAST(('0x' || substring(md5('$seed' || ':' || $e), 1, 15)) AS BIGINT)"

  /** Scaled-int ln in DuckDB — twin of NaiveBayes.lnMicros. */
  private def duckLnMicros(num: String, den: String): String =
    s"CAST(floor(ln(CAST($num AS DOUBLE) / CAST($den AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"

  /** NB training on the full corpus (label = lang): the add-one-smoothed
    * per-(class, term) likelihood table in exact micros.
    */
  val q150NbTrain: Q = Q(
    "q150_nb_train",
    s"""WITH tok AS (
       |  SELECT lang AS label, unnest($DuckToks) AS term FROM documents
       |), counts AS (
       |  SELECT label, term, count(*) AS cnt FROM tok GROUP BY label, term
       |), v AS (SELECT count(DISTINCT term) AS v FROM counts),
       |tot AS (SELECT label, CAST(SUM(cnt) AS BIGINT) AS tot FROM counts GROUP BY label)
       |SELECT c.label, c.term, c.cnt,
       |  ${duckLnMicros("c.cnt + 1", "tot.tot + v.v")} AS lpm
       |FROM counts c JOIN tot USING (label) CROSS JOIN v
       |ORDER BY label, term""".stripMargin) { (s, dir) =>
    val docs = Tables.documentsSpread(s, dir)
    val (likelihood, _) =
      NaiveBayes.train(docs, "doc_id", "lang", TextAnalysis.tokens(col("text")))
    likelihood.orderBy("label", "term")
  }

  /** NB held-out inference: hash-split the corpus 80/20, train on the 80%,
    * classify the 20%, report prediction vs truth per held-out doc. The
    * oracle replays the split, the smoothed model, the per-class unseen
    * backoff, the exact micro-sum scores, and the (score desc, label asc)
    * argmax tiebreak.
    */
  /** Shared oracle core: the held-out NB prediction table as a `pred` CTE
    * (q151 emits it row-wise; q159 aggregates it into per-class metrics).
    */
  private val NbPredCore: String = {
    val split = duckHash("nbsplit", "CAST(doc_id AS VARCHAR)")
    s"""WITH docs AS (
         |  SELECT doc_id, lang, $DuckToks AS toks, $split % 5 = 0 AS test
         |  FROM documents
         |), tok AS (
         |  SELECT label, term, count(*) AS cnt FROM (
         |    SELECT lang AS label, unnest(toks) AS term FROM docs WHERE NOT test
         |  ) GROUP BY label, term
         |), v AS (SELECT count(DISTINCT term) AS v FROM tok),
         |tot AS (SELECT label, CAST(SUM(cnt) AS BIGINT) AS tot FROM tok GROUP BY label),
         |ndocs AS (
         |  SELECT lang AS label, count(*) AS n_docs FROM docs WHERE NOT test GROUP BY lang
         |), n AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n FROM ndocs),
         |stats AS (
         |  SELECT label,
         |    ${duckLnMicros("n_docs", "n.n")} AS prior_lpm,
         |    ${duckLnMicros("1", "tot.tot + v.v")} AS unseen_lpm
         |  FROM ndocs JOIN tot USING (label) CROSS JOIN v CROSS JOIN n
         |), lik AS (
         |  SELECT label, term, ${duckLnMicros("cnt + 1", "tot.tot + v.v")} AS lpm
         |  FROM tok JOIN tot USING (label) CROSS JOIN v
         |), testtok AS (
         |  SELECT doc_id, lang, unnest(toks) AS term FROM docs WHERE test
         |), scored AS (
         |  SELECT t.doc_id, any_value(t.lang) AS lang, s.label,
         |    any_value(s.prior_lpm) + CAST(SUM(COALESCE(l.lpm, s.unseen_lpm)) AS BIGINT) AS score_lpm
         |  FROM testtok t CROSS JOIN stats s
         |  LEFT JOIN lik l ON l.label = s.label AND l.term = t.term
         |  GROUP BY t.doc_id, s.label
         |), pred AS (
         |  SELECT doc_id, pred_lang, lang, score_lpm
         |  FROM (
         |    SELECT doc_id, label AS pred_lang, lang, score_lpm,
         |      row_number() OVER (PARTITION BY doc_id ORDER BY score_lpm DESC, label ASC) AS rn
         |    FROM scored
         |  ) WHERE rn = 1
         |)""".stripMargin
  }

  /** Shared engine core: the held-out prediction table
    * (doc_id, pred_lang, lang, score_lpm).
    */
  private def nbPredictions(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables.documentsSpread(s, dir)
      .withColumn("test",
        Hashing.hash60(col("doc_id").cast("string"), "nbsplit") % 5 === 0)
    val toks = TextAnalysis.tokens(col("text"))
    val (likelihood, classStats) =
      NaiveBayes.train(docs.where(!col("test")), "doc_id", "lang", toks)
    NaiveBayes.classify(docs.where(col("test")), "doc_id", toks,
        likelihood, classStats)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .select(col("doc_id"), col("pred_label").as("pred_lang"), col("lang"),
        col("score_lpm"))
  }

  val q151NbClassify: Q = Q(
    "q151_nb_classify",
    s"""$NbPredCore
       |SELECT doc_id, pred_lang, lang, pred_lang = lang AS correct, score_lpm
       |FROM pred
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    nbPredictions(s, dir)
      .select(col("doc_id"), col("pred_lang"), col("lang"),
        (col("pred_lang") === col("lang")).as("correct"), col("score_lpm"))
      .orderBy("doc_id")
  }

  /** Classifier evaluation: per-class tp/fp/fn/support from the held-out
    * predictions — the confusion-matrix audit that accompanies any trained
    * filter before it gates a corpus. Raw integer counts (precision/recall
    * are driver-side divisions of these), so the gate is exact.
    */
  val q159NbEval: Q = Q(
    "q159_nb_eval",
    s"""$NbPredCore,
       |conf AS (SELECT lang, pred_lang, count(*) AS n FROM pred GROUP BY 1, 2),
       |cls AS (SELECT lang AS c FROM conf UNION SELECT pred_lang FROM conf),
       |tpx AS (SELECT lang AS c, SUM(n) AS tp FROM conf WHERE lang = pred_lang GROUP BY 1),
       |tn AS (SELECT lang AS c, SUM(n) AS support FROM conf GROUP BY 1),
       |pn AS (SELECT pred_lang AS c, SUM(n) AS predn FROM conf GROUP BY 1)
       |SELECT c AS lang, CAST(coalesce(tp, 0) AS BIGINT) AS tp,
       |  CAST(coalesce(predn, 0) - coalesce(tp, 0) AS BIGINT) AS fp,
       |  CAST(coalesce(support, 0) - coalesce(tp, 0) AS BIGINT) AS fn,
       |  CAST(coalesce(support, 0) AS BIGINT) AS support
       |FROM cls LEFT JOIN tpx USING (c) LEFT JOIN tn USING (c)
       |  LEFT JOIN pn USING (c)
       |ORDER BY lang""".stripMargin) { (s, dir) =>
    // localCheckpoint, not persist: the |classes|²-row confusion table is
    // materialized once and auto-freed by GC — no cached table outlives the
    // gate (round-8 verdict #2)
    val conf = nbPredictions(s, dir)
      .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val cls = conf.select(col("lang").as("c"))
      .unionByName(conf.select(col("pred_lang").as("c"))).distinct()
    val tp = conf.where(col("lang") === col("pred_lang"))
      .select(col("lang").as("c"), col("n").as("tp"))
    val support = conf.groupBy(col("lang").as("c")).agg(sum("n").as("support"))
    val predn = conf.groupBy(col("pred_lang").as("c")).agg(sum("n").as("predn"))
    cls.join(tp, Seq("c"), "left")
      .join(support, Seq("c"), "left")
      .join(predn, Seq("c"), "left")
      .select(col("c").as("lang"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        (coalesce(col("predn"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fp"),
        (coalesce(col("support"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fn"),
        coalesce(col("support"), lit(0L)).as("support"))
      .orderBy("lang")
  }

  /** χ² feature selection (Yang & Pedersen ICML'97): top-20 most
    * class-indicative terms per language from document-presence 2×2
    * contingencies — the vocabulary pruner run before classifier training.
    * Counts are exact BIGINT and the χ² score is ONE pinned IEEE sequence
    * (no ln), so the oracle replays it bit-for-bit; ties break on term.
    */
  val q171Chi2Terms: Q = Q(
    "q171_chi2_terms",
    s"""WITH p AS (
       |  SELECT doc_id, lang, unnest(list_distinct($DuckToks)) AS term
       |  FROM documents
       |), tc AS (
       |  SELECT term, lang AS label, count(*) AS a FROM p GROUP BY 1, 2
       |), tt AS (SELECT term, CAST(SUM(a) AS BIGINT) AS ttot FROM tc GROUP BY 1),
       |ct AS (SELECT lang AS label, count(*) AS nc FROM documents GROUP BY 1),
       |nn AS (SELECT count(*) AS n FROM documents),
       |en AS (
       |  SELECT tc.label, tc.term, tc.a, tt.ttot - tc.a AS b,
       |    ct.nc - tc.a AS c, nn.n - ct.nc - (tt.ttot - tc.a) AS d, nn.n AS n
       |  FROM tc JOIN tt USING (term) JOIN ct USING (label) CROSS JOIN nn
       |  WHERE tt.ttot < nn.n
       |), sc AS (
       |  SELECT label, term, a, b, c, d,
       |    CAST(floor(
       |      ((CAST(n AS DOUBLE) * CAST(a*d - b*c AS DOUBLE)) * CAST(a*d - b*c AS DOUBLE)) /
       |      (((CAST(a+b AS DOUBLE) * CAST(c+d AS DOUBLE)) * CAST(a+c AS DOUBLE)) * CAST(b+d AS DOUBLE))
       |      * 1000000 + 0.5) AS BIGINT) AS chi2_micros
       |  FROM en
       |)
       |SELECT label, CAST(rnk AS BIGINT) AS rnk, term, a, b, c, d, chi2_micros
       |FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY label ORDER BY chi2_micros DESC, term) AS rnk
       |  FROM sc
       |) WHERE rnk <= 20
       |ORDER BY label, rnk""".stripMargin) { (s, dir) =>
    graft.ops.FeatureSelect.chiSquaredTopK(Tables.documentsSpread(s, dir),
        "doc_id", "lang", TextAnalysis.tokens(col("text")), k = 20)
      .orderBy("label", "rnk")
  }

  val all: Seq[Q] = Seq(q150NbTrain, q151NbClassify, q159NbEval, q171Chi2Terms)
}
