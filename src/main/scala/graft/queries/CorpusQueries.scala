package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Exact, TextAnalysis}
import graft.ops.{Corpus, Dedup}

/** Corpus-curation gates: Gopher-style repetition signals, inverted index,
  * PMI collocations, blocked edit-distance near-dup, per-source drift.
  */
object CorpusQueries {

  /** DuckDB token list matching TextAnalysis.tokens on this corpus. */
  private val DuckToks = "list_filter(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' '), t -> len(t) > 0)"

  /** DuckDB adjacent-bigram list from a token list `l`. */
  private val DuckBigrams =
    "list_transform(list_zip(l[1:-2], l[2:-1]), x -> x[1] || ' ' || x[2])"

  /** Per-document repetition signals (Gopher-style quality rules):
    * duplicate-token ratio, top-token fraction, top-bigram fraction.
    * Spark computes the mode counts with a per-row sorted fold
    * (TextAnalysis.modeCount) — no shuffle; the oracle does the equivalent
    * explode + two-level groupBy.
    */
  val q64Repetition: Q = Q(
    "q64_repetition",
    s"""WITH t AS (SELECT doc_id, $DuckToks AS l FROM documents),
       |u AS (SELECT doc_id, unnest(l) AS tok FROM t),
       |uc AS (SELECT doc_id, max(c) AS top_tok FROM (
       |  SELECT doc_id, tok, count(*) AS c FROM u GROUP BY doc_id, tok) GROUP BY doc_id),
       |bu AS (SELECT doc_id, unnest($DuckBigrams) AS big FROM t),
       |bc AS (SELECT doc_id, max(c) AS top_big FROM (
       |  SELECT doc_id, big, count(*) AS c FROM bu GROUP BY doc_id, big) GROUP BY doc_id)
       |SELECT t.doc_id,
       |  len(l) AS n_tokens,
       |  len(list_distinct(l)) AS n_distinct,
       |  ${Exact.roundPortableSql(
             "CAST(len(l) - len(list_distinct(l)) AS DOUBLE) / greatest(len(l), 1)", 4)} AS dup_ratio,
       |  uc.top_tok AS top_token_count,
       |  ${Exact.roundPortableSql(
             "CAST(uc.top_tok AS DOUBLE) / greatest(len(l), 1)", 4)} AS top_token_frac,
       |  bc.top_big AS top_bigram_count,
       |  ${Exact.roundPortableSql(
             "CAST(bc.top_big AS DOUBLE) / greatest(len(l) - 1, 1)", 4)} AS top_bigram_frac
       |FROM t JOIN uc USING (doc_id) JOIN bc USING (doc_id)
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.documentsSpread(s, dir)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_distinct", size(array_distinct(col("toks"))))
      .withColumn("top_token_count", TextAnalysis.modeCount(col("toks")))
      .withColumn("top_bigram_count", TextAnalysis.modeCount(TextAnalysis.bigrams(col("toks"))))
      .select(
        col("doc_id"), col("n_tokens"), col("n_distinct"),
        Exact.roundPortable((col("n_tokens") - col("n_distinct")).cast("double") /
          greatest(col("n_tokens"), lit(1)), 4).as("dup_ratio"),
        col("top_token_count"),
        Exact.roundPortable(col("top_token_count").cast("double") /
          greatest(col("n_tokens"), lit(1)), 4).as("top_token_frac"),
        col("top_bigram_count"),
        Exact.roundPortable(col("top_bigram_count").cast("double") /
          greatest(col("n_tokens") - 1, lit(1)), 4).as("top_bigram_frac"))
      .orderBy("doc_id")
  }

  /** Inverted index: term → (df, sorted posting list), df ≥ 5.
    *
    * Gate boundary: the posting ARRAY is comma-joined to one string per
    * term — the driver's pandas hasher cannot sort array cells (round-5
    * q65 crash); [[Corpus.invertedIndex]] itself stays array-native for
    * downstream consumers.
    */
  val q65InvertedIndex: Q = Q(
    "q65_inverted_index",
    s"""WITH u AS (SELECT doc_id, unnest(list_distinct($DuckToks)) AS term FROM documents)
       |SELECT term, count(*) AS df,
       |  array_to_string(list_transform(list_sort(list(doc_id))[1:10000],
       |    x -> CAST(x AS VARCHAR)), ',') AS postings
       |FROM u GROUP BY term HAVING count(*) >= 5
       |ORDER BY term""".stripMargin) { (s, dir) =>
    Corpus.invertedIndex(Tables.documentsSpread(s, dir), "doc_id", "text", minDf = 5L)
      .withColumn("postings", array_join(col("postings").cast("array<string>"), ","))
      .orderBy("term")
  }

  /** Top-20 collocations by PMI, ranked via the exact likelihood ratio
    * (both engines compute the same two exact integers and divide once, so
    * the ordering doubles are bit-identical).
    */
  val q66Collocations: Q = {
    val scoreSql = "CAST(b.c_xy * t.n_uni * t.n_uni AS DOUBLE) / " +
      "CAST(t.m_bi * u1.c_w * u2.c_w AS DOUBLE)"
    Q(
      "q66_collocations",
      s"""WITH toks AS (SELECT $DuckToks AS l FROM documents),
         |uni AS (SELECT w, count(*) AS c_w FROM (SELECT unnest(l) AS w FROM toks) GROUP BY w),
         |bi AS (SELECT big, count(*) AS c_xy FROM (
         |  SELECT unnest($DuckBigrams) AS big FROM toks) GROUP BY big),
         |t AS (SELECT (SELECT CAST(sum(c_w) AS BIGINT) FROM uni) AS n_uni,
         |             (SELECT CAST(sum(c_xy) AS BIGINT) FROM bi) AS m_bi)
         |SELECT b.big AS bigram, b.c_xy, u1.c_w AS c_x, u2.c_w AS c_y,
         |  ${Exact.roundPortableSql(scoreSql, 6)} AS score
         |FROM bi b CROSS JOIN t
         |  JOIN uni u1 ON u1.w = string_split(b.big, ' ')[1]
         |  JOIN uni u2 ON u2.w = string_split(b.big, ' ')[2]
         |WHERE b.c_xy >= 5
         |ORDER BY $scoreSql DESC, b.big
         |LIMIT 20""".stripMargin) { (s, dir) =>
      Corpus.pmiCollocations(Tables.documentsSpread(s, dir), "text", minCount = 5L, topK = 20)
        .withColumn("score", Exact.roundPortable(col("score"), 6))
    }
  }

  /** Blocked Levenshtein near-dup: 40-char-prefix blocks, distance ≤ 16,
    * thresholded banded levenshtein on the Spark side.
    *
    * Domain contract (round-14 advice): the DuckDB oracle has no length
    * cap, while the Spark side refuses texts > maxTextLen — an asymmetry
    * on long-but-valid input. The gate pins maxTextLen EXPLICITLY (so a
    * future default change cannot silently narrow this gate's domain) and
    * the testdata bound is measured, not assumed: documents.text is
    * ≤ 577 chars at every shipped SF (sf0.001/0.01/0.1 — max 558/553/577),
    * a 7× margin under the guard, so both engines compute the same
    * function over the gate's whole domain.
    */
  val q67EditDistance: Q = Q(
    "q67_edit_distance",
    """WITH t AS (SELECT doc_id, text, substr(text, 1, 40) AS blk, len(text) AS l FROM documents)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b, levenshtein(a.text, b.text) AS dist
      |FROM t a JOIN t b ON a.blk = b.blk AND a.doc_id < b.doc_id AND abs(a.l - b.l) <= 16
      |WHERE levenshtein(a.text, b.text) <= 16
      |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    Dedup.editDistancePairs(Tables.documentsSpread(s, dir), "doc_id", "text",
        substring(col("text"), 1, 40), maxDist = 16, maxTextLen = 4096)
      .orderBy("id_a", "id_b")
  }

  /** Per-source total variation distance from the corpus unigram
    * distribution — exact integer numerators, one final division.
    */
  val q68SourceDrift: Q = Q(
    "q68_source_drift",
    s"""WITH u AS (SELECT source, unnest($DuckToks) AS tok FROM documents),
       |gt AS (SELECT source, tok, count(*) AS c_tg FROM u GROUP BY source, tok),
       |tt AS (SELECT tok, CAST(sum(c_tg) AS BIGINT) AS c_t FROM gt GROUP BY tok),
       |gtot AS (SELECT source, CAST(sum(c_tg) AS BIGINT) AS n_g FROM gt GROUP BY source),
       |n AS (SELECT CAST(sum(c_t) AS BIGINT) AS n FROM tt),
       |pres AS (SELECT g.source,
       |    CAST(sum(abs(g.c_tg * n.n - t.c_t * gt2.n_g)) AS BIGINT) AS present_abs,
       |    CAST(sum(t.c_t) AS BIGINT) AS s_g
       |  FROM gt g JOIN tt t USING (tok) JOIN gtot gt2 USING (source) CROSS JOIN n
       |  GROUP BY g.source)
       |SELECT p.source, g.n_g AS group_tokens,
       |  ${Exact.roundPortableSql(
           "CAST(p.present_abs + (n.n - p.s_g) * g.n_g AS DOUBLE) / CAST(2 * g.n_g * n.n AS DOUBLE)", 6)} AS tvd
       |FROM pres p JOIN gtot g USING (source) CROSS JOIN n
       |ORDER BY source""".stripMargin) { (s, dir) =>
    Corpus.groupDriftTvd(Tables.documentsSpread(s, dir), "source", "text")
      .select(col("grp").as("source"), col("group_tokens"),
        Exact.roundPortable(col("tvd"), 6).as("tvd"))
      .orderBy("source")
  }

  /** Tokenizer-vocabulary coverage: top-1000 corpus vocabulary (count
    * desc, term asc — deterministic cutoff), then each doc's OOV count and
    * rate. Zero-token docs are excluded (no rate defined).
    */
  val q117VocabCoverage: Q = Q(
    "q117_vocab_coverage",
    s"""WITH tok AS (SELECT doc_id, unnest($DuckToks) AS term FROM documents),
       |counts AS (SELECT term, count(*) AS n FROM tok GROUP BY term),
       |vocab AS (SELECT term FROM counts ORDER BY n DESC, term LIMIT 1000)
       |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tok,
       |  CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov,
       |  ${Exact.roundPortableSql(
          "CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 6)} AS oov_rate
       |FROM tok t LEFT JOIN vocab v ON t.term = v.term
       |GROUP BY t.doc_id
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Corpus.vocabCoverage(Tables.documentsSpread(s, dir), "doc_id", "text", 1000)
      .orderBy("doc_id")
  }

  /** Stupid Backoff bigram LM scoring (Brants EMNLP'07): count-only LM
    * from the 80% hash slice, scored over every doc — seen bigrams use
    * C12/C1, unseen back off to α·C(w2)/N, unseen unigrams to α/N. The
    * held-out 20% makes every backoff path live.
    */
  val q121StupidBackoff: Q = {
    val sbScoreSql = Exact.roundPortableSql(
      "CAST(CAST(SUM(s) AS BIGINT) AS DOUBLE) / 1000000.0 / CAST(count(*) AS DOUBLE)", 6)
    Q(
      "q121_stupid_backoff",
      s"""WITH d AS (
         |  SELECT doc_id, $DuckToks AS l,
         |    CAST(('0x' || substring(md5('lm' || ':' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 5 <> 0 AS lm
         |  FROM documents
         |), bp AS (
         |  SELECT doc_id, lm, unnest($DuckBigrams) AS bigram FROM d
         |), bc AS (
         |  SELECT bigram, count(*) AS c12 FROM bp WHERE lm GROUP BY bigram
         |), ut AS (
         |  SELECT unnest(l) AS w FROM d WHERE lm
         |), uc AS (
         |  SELECT w, count(*) AS cw FROM ut GROUP BY w
         |), nn AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n FROM ut
         |), ty AS (
         |  SELECT bigram, string_split(bigram, ' ')[1] AS w1,
         |    string_split(bigram, ' ')[2] AS w2
         |  FROM (SELECT DISTINCT bigram FROM bp)
         |), st AS (
         |  SELECT ty.bigram AS bigram,
         |    CASE
         |      WHEN bc.c12 IS NOT NULL THEN
         |        CAST(floor(ln(CAST(bc.c12 AS DOUBLE) / CAST(u1.cw AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
         |      WHEN u2.cw IS NOT NULL THEN
         |        CAST(floor(ln(0.4 * CAST(u2.cw AS DOUBLE) / CAST(nn.n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
         |      ELSE
         |        CAST(floor(ln(0.4 / CAST(nn.n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
         |    END AS s
         |  FROM ty LEFT JOIN bc ON ty.bigram = bc.bigram
         |    LEFT JOIN uc u1 ON ty.w1 = u1.w
         |    LEFT JOIN uc u2 ON ty.w2 = u2.w, nn
         |)
         |SELECT doc_id, count(*) AS n_bigrams, $sbScoreSql AS sb_score
         |FROM bp JOIN st USING (bigram)
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.ops.Scoring.stupidBackoff(Tables.documentsSpread(s, dir), "doc_id",
          TextAnalysis.tokens(col("text")),
          graft.functions.Hashing.hash60(col("doc_id").cast("string"), "lm") % 5 =!= 0,
          0.4)
        .orderBy("doc_id")
    }
  }

  /** Heaps-law vocabulary-growth curve at 8 equal corpus prefixes (in
    * doc_id order): cumulative token count and distinct-vocabulary size.
    * The engine computes it in ONE corpus shuffle — each term's first-seen
    * doc id, bucketed onto the grid, then a grid-sized cumulative window —
    * never one COUNT DISTINCT per checkpoint (`Corpus.vocabGrowth`); the
    * oracle replays the same first-seen/bucket decomposition (equivalent
    * to prefix distinct-counts by construction: a term is in the prefix
    * vocabulary iff its first occurrence is).
    */
  val q212VocabGrowth: Q = {
    val points = 8
    Q(
      "q212_vocab_growth",
      s"""WITH tk AS (
         |  SELECT doc_id, $DuckToks AS l FROM documents
         |), nn AS (SELECT max(doc_id) + 1 AS n FROM documents),
         |fs AS (
         |  SELECT tok, min(doc_id) AS fs FROM (
         |    SELECT doc_id, unnest(list_distinct(l)) AS tok FROM tk)
         |  GROUP BY tok
         |), ft AS (
         |  SELECT least((fs * $points) // n + 1, $points) AS i,
         |    count(*) AS new_terms
         |  FROM fs, nn GROUP BY 1
         |), tc AS (
         |  SELECT least((doc_id * $points) // n + 1, $points) AS i,
         |    sum(len(l)) AS new_toks
         |  FROM tk, nn GROUP BY 1
         |), grid AS (SELECT unnest(generate_series(1, $points)) AS i)
         |SELECT CAST(g.i AS BIGINT) AS i,
         |  (g.i * nn.n + ${points - 1}) // $points AS prefix_docs,
         |  CAST(sum(coalesce(tc.new_toks, 0)) OVER (ORDER BY g.i) AS BIGINT) AS n_tokens,
         |  CAST(sum(coalesce(ft.new_terms, 0)) OVER (ORDER BY g.i) AS BIGINT) AS vocab
         |FROM grid g CROSS JOIN nn
         |LEFT JOIN ft ON ft.i = g.i LEFT JOIN tc ON tc.i = g.i
         |ORDER BY i""".stripMargin) { (s, dir) =>
      Corpus.vocabGrowth(Tables.documents(s, dir), "doc_id", "text", points)
        .orderBy("i")
    }
  }

  /** Jensen-Shannon unigram drift per source (the bounded, symmetric
    * companion to q68's TVD): present-token contributions quantized to
    * 1e-12 Longs before summing (q88's log-portability discipline — the
    * ONLY floats crossing an aggregation boundary are already integers),
    * absent-token mass folded analytically into 0.5·(1−Σq)·ln 2.
    */
  val q222JsDrift: Q = Q(
    "q222_js_drift",
    s"""WITH gt AS (
       |  SELECT source AS grp, tok, count(*) AS c_tg FROM (
       |    SELECT source, unnest($DuckToks) AS tok FROM documents)
       |  GROUP BY source, tok
       |), tt AS (SELECT tok, sum(c_tg) AS c_t FROM gt GROUP BY tok),
       |gg AS (SELECT grp, sum(c_tg) AS n_g FROM gt GROUP BY grp),
       |nn AS (SELECT sum(c_t) AS n FROM tt),
       |pq AS (
       |  SELECT gt.grp, gg.n_g, nn.n, tt.c_t,
       |    CAST(gt.c_tg AS DOUBLE) / CAST(gg.n_g AS DOUBLE) AS p,
       |    CAST(tt.c_t AS DOUBLE) / CAST(nn.n AS DOUBLE) AS q
       |  FROM gt JOIN tt USING (tok) JOIN gg USING (grp) CROSS JOIN nn
       |), terms AS (
       |  SELECT grp, n_g, n, c_t,
       |    CAST(floor((0.5 * p * ln(p / ((p + q) / 2.0))
       |      + 0.5 * q * ln(q / ((p + q) / 2.0))) * 1e12 + 0.5) AS BIGINT) AS t12
       |  FROM pq)
       |SELECT grp AS source, CAST(min(n_g) AS BIGINT) AS group_tokens,
       |  ${graft.functions.Exact.roundPortableSql(
          "CAST(CAST(sum(t12) AS BIGINT) AS DOUBLE) / 1e12 + " +
          "(0.5 * (1.0 - CAST(CAST(sum(c_t) AS BIGINT) AS DOUBLE) / CAST(min(n) AS DOUBLE))) * ln(2)", 6)} AS js
       |FROM terms GROUP BY grp ORDER BY source""".stripMargin) { (s, dir) =>
    Corpus.jsDrift(Tables.documents(s, dir), "source", "text")
      .withColumnRenamed("grp", "source")
      .orderBy("source")
  }

  val all: Seq[Q] = Seq(q64Repetition, q65InvertedIndex, q66Collocations,
    q67EditDistance, q68SourceDrift, q117VocabCoverage, q121StupidBackoff,
    q212VocabGrowth, q222JsDrift)
}
