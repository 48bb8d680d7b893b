package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Exact, Hashing, TextAnalysis}
import graft.ops.{Curation, Scoring}

/** Corpus-curation gates: decontamination, token-budget selection,
  * duplicated spans, domain mixture, quality bands, approx-distinct,
  * chunking, BM25, unigram-LM scoring. Every float that crosses the gate
  * boundary is either portably rounded or an exact micro-scaled sum (see
  * [[graft.ops.Scoring]] scaladoc for the pattern).
  */
object CurationQueries {

  private val DuckToks = "list_filter(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' '), t -> len(t) > 0)"
  /** DuckDB 60-bit portable hash of expression `e` under `seed` — the SQL
    * twin of [[Hashing.hash60]].
    */
  private def duckHash(seed: String, e: String): String =
    s"CAST(('0x' || substring(md5('$seed' || ':' || $e), 1, 15)) AS BIGINT)"

  /** DuckDB adjacent-bigram list from a token list `l` — the SQL twin of
    * [[TextAnalysis.bigrams]].
    */
  private val DuckBigrams =
    "list_transform(list_zip(l[1:-2], l[2:-1]), x -> x[1] || ' ' || x[2])"

  /** DuckDB word `n`-gram shingles (distinct) over a `toks` list column —
    * the SQL twin of [[TextAnalysis.wordShingles]].
    */
  private def duckShingles(n: Int): String =
    s"""list_distinct(list_transform(
       |      generate_series(1, greatest(len(toks) - ${n - 1}, 0)),
       |      i -> array_to_string(toks[i:i+${n - 1}], ' ')))""".stripMargin

  /** Shared CTE body: (doc_id, source, score, tokens) with the q23 quality
    * formula rounded to 4 decimals — the SQL twin of
    * [[TextAnalysis.qualityScore]] + roundPortable(4).
    */
  private def qualityDocsSql: String = {
    val allStop = TextAnalysis.Stopwords.values.flatten.toSeq.distinct.sorted
    val stopList = allStop.map(w => s"'$w'").mkString(",")
    s"""SELECT doc_id, source, lang,
       |    CAST(floor(
       |      ((least(CAST(2.0 AS DOUBLE) * len(list_filter(toks, t -> t IN ($stopList))) / greatest(CAST(len(toks) AS DOUBLE), CAST(1.0 AS DOUBLE)), CAST(1.0 AS DOUBLE))
       |        + length(regexp_replace(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z]', '', 'g')) / greatest(CAST(length(text) AS DOUBLE), CAST(1.0 AS DOUBLE))
       |        + CASE WHEN mtl >= 3 AND mtl <= 12 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
       |        + least(CAST(len(toks) AS DOUBLE) / CAST(200.0 AS DOUBLE), CAST(1.0 AS DOUBLE))) / CAST(4.0 AS DOUBLE))
       |      * 10000 + 0.5) AS BIGINT) / CAST(10000 AS DOUBLE) AS score,
       |    CAST(len(toks) AS BIGINT) AS tokens
       |  FROM (
       |    SELECT doc_id, source, lang, text, toks,
       |      CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / greatest(CAST(len(toks) AS DOUBLE), CAST(1.0 AS DOUBLE)) AS mtl
       |    FROM (SELECT doc_id, source, lang, text, $DuckToks AS toks FROM documents)
       |  )""".stripMargin
  }

  /** Spark twin of [[qualityDocsSql]]. */
  private def qualityDocs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.documentsSpread(s, dir).select(col("doc_id"), col("source"), col("lang"),
      Exact.roundPortable(TextAnalysis.qualityScore(col("text")), 4).as("score"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("tokens"))

  /** Benchmark decontamination: 5-gram overlap between the (hash-selected
    * ~2.7%) "benchmark" slice and the rest of the corpus.
    */
  val q80Decontaminate: Q = Q(
    "q80_decontaminate",
    s"""WITH t AS (
       |  SELECT doc_id,
       |    ${duckHash("bench", "CAST(doc_id AS VARCHAR)")} % 37 = 0 AS bench,
       |    ${duckShingles(5)} AS sh
       |  FROM (SELECT doc_id, $DuckToks AS toks FROM documents)
       |), bg AS (
       |  SELECT DISTINCT ${duckHash("decon", "g")} AS g
       |  FROM (SELECT unnest(sh) AS g FROM t WHERE bench)
       |), tg AS (
       |  SELECT doc_id, ${duckHash("decon", "g")} AS g
       |  FROM (SELECT doc_id, unnest(sh) AS g FROM t WHERE NOT bench)
       |)
       |SELECT tg.doc_id AS doc_id, count(*) AS n_shared
       |FROM tg JOIN bg USING (g)
       |GROUP BY tg.doc_id
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Curation.decontaminate(
        Tables.documentsSpread(s, dir), "doc_id",
        graft.functions.WordShinglesExpr(col("text"), 5),
        Hashing.hash60(col("doc_id").cast("string"), "bench") % 37 === 0)
      .orderBy("doc_id")
  }

  /** Greedy token-budget selection via the distributed prefix sum. */
  val q81TokenBudget: Q = Q(
    "q81_token_budget",
    s"""WITH q AS (
       |  $qualityDocsSql
       |)
       |SELECT doc_id, score, tokens,
       |  CAST(COALESCE(SUM(tokens) OVER (ORDER BY score DESC, doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before,
       |  CAST(COALESCE(SUM(tokens) OVER (ORDER BY score DESC, doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) < 10000 AS selected
       |FROM q
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Curation.tokenBudgetSelect(qualityDocs(s, dir).drop("source"),
        "doc_id", col("score"), col("tokens"), 10000L)
      .select("doc_id", "score", "tokens", "cum_before", "selected")
      .orderBy("doc_id")
  }

  /** Duplicated 8-token spans across documents (substring-dedup signal). */
  val q82DupSpans: Q = Q(
    "q82_dup_spans",
    s"""WITH t AS (
       |  SELECT doc_id, ${duckShingles(8)} AS sh
       |  FROM (SELECT doc_id, $DuckToks AS toks FROM documents)
       |), sp AS (
       |  SELECT doc_id, ${duckHash("span", "g")} AS g
       |  FROM (SELECT doc_id, unnest(sh) AS g FROM t)
       |), df AS (
       |  SELECT g, count(*) AS ndocs FROM sp GROUP BY g
       |)
       |SELECT doc_id, n_spans, n_dup,
       |  ${Exact.roundPortableSql("CAST(n_dup AS DOUBLE) / n_spans", 6)} AS dup_frac
       |FROM (
       |  SELECT sp.doc_id AS doc_id, count(*) AS n_spans,
       |    CAST(SUM(CASE WHEN df.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
       |  FROM sp JOIN df USING (g)
       |  GROUP BY sp.doc_id
       |)
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Curation.duplicateSpans(Tables.documentsSpread(s, dir), "doc_id",
        graft.functions.WordShinglesExpr(col("text"), 8))
      .orderBy("doc_id")
  }

  /** Temperature-scaled (alpha = 0.5) domain-mixture weights by source. */
  val q83DomainMixture: Q = Q(
    "q83_domain_mixture",
    s"""WITH per AS (
       |  SELECT source, CAST(SUM(len(toks)) AS BIGINT) AS toks
       |  FROM (SELECT source, $DuckToks AS toks FROM documents)
       |  GROUP BY source
       |), w AS (
       |  SELECT source, toks,
       |    CAST(toks AS DOUBLE) / CAST(SUM(toks) OVER () AS BIGINT) AS share_raw
       |  FROM per
       |), m AS (
       |  SELECT source, toks, share_raw,
       |    CAST(floor(sqrt(share_raw) * 1000000 + 0.5) AS BIGINT) AS wm
       |  FROM w
       |)
       |SELECT source, toks,
       |  ${Exact.roundPortableSql("share_raw", 6)} AS share,
       |  ${Exact.roundPortableSql(
             "CAST(wm AS DOUBLE) / CAST(CAST(SUM(wm) OVER () AS BIGINT) AS DOUBLE)", 6)} AS weight
       |FROM m
       |ORDER BY source""".stripMargin) { (s, dir) =>
    Curation.domainMixture(
        Tables.documentsSpread(s, dir)
          .select(col("source"), TextAnalysis.tokens(col("text")).as("_t")),
        "source", size(col("_t")))
      .orderBy("source")
  }

  /** Per-source percent_rank quality banding. */
  val q84QualityBands: Q = Q(
    "q84_quality_bands",
    s"""WITH q AS (
       |  $qualityDocsSql
       |)
       |SELECT doc_id, source, score,
       |  ${Exact.roundPortableSql("pr", 6)} AS pr,
       |  least(CAST(floor(pr * 10) AS BIGINT), 9) AS band
       |FROM (
       |  SELECT doc_id, source, score,
       |    percent_rank() OVER (PARTITION BY source ORDER BY score) AS pr
       |  FROM q
       |)
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Curation.qualityBands(qualityDocs(s, dir), "doc_id", "source", col("score"))
      .orderBy("doc_id")
  }

  /** HyperLogLog approx-distinct with a verified error bound: the oracle
    * checks the exact side and that the sketch landed within 5% (or ±5 at
    * tiny cardinalities) — rsd 0.01 makes the bound safe.
    */
  val q85ApproxDistinct: Q = Q(
    "q85_approx_distinct",
    """SELECT event_type, count(DISTINCT user_id) AS exact_users,
      |  TRUE AS approx_ok
      |FROM events GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.01).as("_approx"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("_approx") - col("exact_users")).cast("double")
          <= greatest(col("exact_users").cast("double") * 0.05, lit(5.0)))
          .as("approx_ok"))
      .orderBy("event_type")
  }

  /** Sliding-window chunking: 32-token windows, stride 24. */
  val q86DocChunks: Q = Q(
    "q86_doc_chunks",
    s"""WITH t AS (
       |  SELECT doc_id, toks,
       |    CASE WHEN len(toks) <= 0 THEN 0
       |         WHEN len(toks) <= 32 THEN 1
       |         ELSE CAST(floor(CAST(len(toks) - 32 + 23 AS DOUBLE) / 24) AS BIGINT) + 1
       |    END AS nc
       |  FROM (SELECT doc_id, $DuckToks AS toks FROM documents)
       |)
       |SELECT doc_id, i AS chunk_idx,
       |  CAST(len(toks[i*24+1 : i*24+32]) AS BIGINT) AS n_toks,
       |  md5(array_to_string(toks[i*24+1 : i*24+32], ' ')) AS fp
       |FROM (
       |  SELECT doc_id, toks, unnest(generate_series(0, nc - 1)) AS i
       |  FROM t WHERE nc > 0
       |)
       |ORDER BY doc_id, chunk_idx""".stripMargin) { (s, dir) =>
    Curation.slidingChunks(
        Tables.documentsSpread(s, dir).select(col("doc_id"), col("text")),
        "doc_id", TextAnalysis.tokens(col("text")), 32, 24)
      .orderBy("doc_id", "chunk_idx")
  }

  /** Okapi BM25 top-50 for a fixed query-term bag. */
  val q87Bm25: Q = {
    val terms = Seq("hash", "scan", "merge")
    val (k1, b, k) = (1.2, 0.75, 50)
    val termList = terms.map(t => s"'$t'").mkString(", ")
    val avgdlSql = "(CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE))"
    val idfSql = Exact.roundPortableSql(
      "ln((CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1.0)", 6)
    Q(
      "q87_bm25",
      s"""WITH base AS (
         |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl
         |  FROM (SELECT doc_id, $DuckToks AS toks FROM documents)
         |), stats AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl FROM base
         |), tf AS (
         |  SELECT doc_id, dl, term, count(*) AS tf
         |  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM base)
         |  WHERE term IN ($termList)
         |  GROUP BY doc_id, dl, term
         |), dft AS (
         |  SELECT term, count(*) AS df FROM tf GROUP BY term
         |), scored AS (
         |  SELECT doc_id,
         |    CAST(floor($idfSql * (CAST(tf AS DOUBLE) * ${k1 + 1.0})
         |      / (CAST(tf AS DOUBLE) + (1.0 - $b + (CAST(dl AS DOUBLE) / $avgdlSql) * $b) * $k1)
         |      * 1000000.0 + 0.5) AS BIGINT) AS pm
         |  FROM tf JOIN dft USING (term), stats
         |)
         |SELECT doc_id, CAST(CAST(SUM(pm) AS BIGINT) AS DOUBLE) / 1000000.0 AS score
         |FROM scored GROUP BY doc_id
         |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin) { (s, dir) =>
      Scoring.bm25(Tables.documentsSpread(s, dir).select(col("doc_id"), col("text")),
        "doc_id", TextAnalysis.tokens(col("text")), terms, k1, b, k)
    }
  }

  /** Unigram-LM mean log-probability (perplexity-filter stand-in). */
  val q88UnigramLogprob: Q = Q(
    "q88_unigram_logprob",
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(toks) AS term
       |  FROM (SELECT doc_id, $DuckToks AS toks FROM documents)
       |), lm AS (
       |  SELECT term, count(*) AS cnt FROM tok GROUP BY term
       |), tot AS (
       |  SELECT CAST(SUM(cnt) AS BIGINT) AS tot FROM lm
       |), lp AS (
       |  SELECT term,
       |    CAST(floor(ln(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS lpm
       |  FROM lm, tot
       |)
       |SELECT doc_id, count(*) AS n_toks,
       |  ${Exact.roundPortableSql(
            "CAST(CAST(SUM(lpm) AS BIGINT) AS DOUBLE) / 1000000.0 / CAST(count(*) AS DOUBLE)", 6)} AS avg_lp
       |FROM tok JOIN lp USING (term)
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Scoring.unigramLogProb(Tables.documentsSpread(s, dir), "doc_id",
        TextAnalysis.tokens(col("text")))
      .orderBy("doc_id")
  }

  /** Incremental dedup: LSH near-dup pairs between the ~20% "new batch"
    * slice and the existing corpus (MinHash 4×3 over word 2-grams, exact
    * Jaccard ≥ 0.5 verify) — the screen-new-data-without-re-pairing-the-
    * corpus primitive.
    */
  val q89IncrementalDedup: Q = {
    val (bands, rows, seed) = (4, 3, "inc")
    Q(
      "q89_incremental_dedup",
      s"""WITH docs AS (
         |  SELECT doc_id,
         |    ${duckHash("newbatch", "CAST(doc_id AS VARCHAR)")} % 5 = 0 AS newb,
         |    ${duckShingles(2)} AS sh
         |  FROM (SELECT doc_id, $DuckToks AS toks FROM documents)
         |), sigs AS (
         |  SELECT doc_id, newb, sh,
         |    list_transform(generate_series(0, ${bands * rows - 1}),
         |      h -> list_min(list_transform(sh,
         |        s -> CAST(('0x' || substring(md5('$seed:' || CAST(h AS VARCHAR) || ':' || s), 1, 15)) AS BIGINT)))) AS sig
         |  FROM docs WHERE len(sh) > 0
         |), bands AS (
         |  SELECT doc_id, newb, sh, b,
         |    md5(array_to_string(sig[b*$rows+1 : b*$rows+$rows], ',')) AS bucket
         |  FROM sigs, generate_series(0, ${bands - 1}) t(b)
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS id_left, b.doc_id AS id_right,
         |    a.sh AS sh_a, b.sh AS sh_b
         |  FROM bands a JOIN bands b ON a.b = b.b AND a.bucket = b.bucket
         |  WHERE NOT a.newb AND b.newb
         |)
         |SELECT id_left, id_right,
         |  ${Exact.roundPortableSql("jac", 6)} AS jac
         |FROM (
         |  SELECT id_left, id_right,
         |    CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
         |      / len(list_distinct(sh_a || sh_b)) AS jac
         |  FROM cand
         |)
         |WHERE jac >= 0.5
         |ORDER BY id_left, id_right""".stripMargin) { (s, dir) =>
      import graft.ops.Dedup
      val docs = Tables.documents(s, dir)
        .withColumn("_sh", graft.functions.WordShinglesExpr(col("text"), 2))
        .withColumn("_newb",
          Hashing.hash60(col("doc_id").cast("string"), "newbatch") % 5 === 0)
      Dedup.crossMinhashLshPairs(docs.filter(!col("_newb")),
          docs.filter(col("_newb")), "doc_id", "_sh", bands, rows, seed, 0.5)
        .withColumn("jac", Exact.roundPortable(col("jac"), 6))
        .orderBy("id_left", "id_right")
    }
  }

  /** Mixture-weight sampling: keep docs at the domain's temperature-scaled
    * rate (rate 1.0 for the most up-weighted domain), decided by the
    * portable unit-interval hash.
    */
  val q90MixtureSample: Q = Q(
    "q90_mixture_sample",
    s"""WITH per AS (
       |  SELECT source, CAST(SUM(len(toks)) AS BIGINT) AS toks
       |  FROM (SELECT source, $DuckToks AS toks FROM documents)
       |  GROUP BY source
       |), w AS (
       |  SELECT source,
       |    CAST(toks AS DOUBLE) / CAST(SUM(toks) OVER () AS BIGINT) AS share_raw
       |  FROM per
       |), m AS (
       |  SELECT source, CAST(floor(sqrt(share_raw) * 1000000 + 0.5) AS BIGINT) AS wm
       |  FROM w
       |), r AS (
       |  SELECT source,
       |    ${Exact.roundPortableSql(
              "CAST(wm AS DOUBLE) / CAST(CAST(SUM(wm) OVER () AS BIGINT) AS DOUBLE)", 6)} AS w6
       |  FROM m
       |), rate AS (
       |  SELECT source, w6 / max(w6) OVER () AS rate FROM r
       |)
       |SELECT d.doc_id, d.source, ${Exact.roundPortableSql("rate", 6)} AS rate
       |FROM documents d JOIN rate USING (source)
       |WHERE CAST(${duckHash("mix", "CAST(doc_id AS VARCHAR)")} AS DOUBLE)
       |      / 1152921504606846976.0 < rate
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Curation.mixtureSample(Tables.documentsSpread(s, dir), "doc_id", "source",
        size(TextAnalysis.tokens(col("text"))), "mix")
      .orderBy("doc_id")
  }

  /** Per-source Tukey-fence outliers on token count (type-7 p25/p75). */
  val q91IqrOutliers: Q = Q(
    "q91_iqr_outliers",
    s"""WITH base AS (
       |  SELECT doc_id, source, CAST(len(toks) AS DOUBLE) AS v
       |  FROM (SELECT doc_id, source, $DuckToks AS toks FROM documents)
       |), r AS (
       |  SELECT doc_id, source, v,
       |    CAST(row_number() OVER (PARTITION BY source ORDER BY v) - 1 AS BIGINT) AS rn,
       |    count(*) OVER (PARTITION BY source) AS n
       |  FROM base
       |), g AS (
       |  SELECT source, max(n) AS n,
       |    max(CASE WHEN rn = CAST(floor(0.25 * (n - 1)) AS BIGINT) THEN v END) AS l25,
       |    max(CASE WHEN rn = CAST(ceil(0.25 * (n - 1)) AS BIGINT) THEN v END) AS h25,
       |    max(CASE WHEN rn = CAST(floor(0.75 * (n - 1)) AS BIGINT) THEN v END) AS l75,
       |    max(CASE WHEN rn = CAST(ceil(0.75 * (n - 1)) AS BIGINT) THEN v END) AS h75
       |  FROM r GROUP BY source
       |), f AS (
       |  SELECT source,
       |    (l25 + (0.25 * (n - 1) - floor(0.25 * (n - 1))) * (h25 - l25)) AS q25,
       |    (l75 + (0.75 * (n - 1) - floor(0.75 * (n - 1))) * (h75 - l75)) AS q75
       |  FROM g
       |), fence AS (
       |  SELECT source, q25 - (q75 - q25) * 1.5 AS lo, q75 + (q75 - q25) * 1.5 AS hi
       |  FROM f
       |)
       |SELECT b.doc_id, b.source, b.v,
       |  ${Exact.roundPortableSql("lo", 6)} AS lo,
       |  ${Exact.roundPortableSql("hi", 6)} AS hi,
       |  (b.v < lo OR b.v > hi) AS is_outlier
       |FROM base b JOIN fence USING (source)
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Curation.iqrOutliers(Tables.documentsSpread(s, dir), "doc_id", "source",
        size(TextAnalysis.tokens(col("text"))))
      .orderBy("doc_id")
  }

  /** C4-style normalization fingerprint (lower, strip, collapse, trim). */
  val q92Normalize: Q = Q(
    "q92_normalize",
    """SELECT doc_id, md5(norm) AS norm_fp, CAST(length(norm) AS BIGINT) AS norm_len
      |FROM (
      |  SELECT doc_id,
      |    trim(regexp_replace(regexp_replace(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z0-9 .,!?'']', ' ', 'g'), ' +', ' ', 'g')) AS norm
      |  FROM documents
      |)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.documentsSpread(s, dir)
      .select(col("doc_id"), TextAnalysis.normalizeText(col("text")).as("_norm"))
      .select(col("doc_id"), md5(col("_norm")).as("norm_fp"),
        length(col("_norm")).cast("long").as("norm_len"))
      .orderBy("doc_id")
  }

  /** Per-source data-card profile (counts, mean tokens, modal lang, mean
    * quality) — quality folded in as exact micros of the 4dp-rounded
    * score.
    */
  val q93SourceProfile: Q = Q(
    "q93_source_profile",
    s"""WITH q AS (
       |  $qualityDocsSql
       |), base AS (
       |  SELECT source, lang, tokens AS tk,
       |    CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS qm
       |  FROM q
       |), per AS (
       |  SELECT source, count(*) AS n_docs, CAST(SUM(tk) AS BIGINT) AS n_tokens,
       |    count(DISTINCT lang) AS n_langs, CAST(SUM(qm) AS BIGINT) AS qs
       |  FROM base GROUP BY source
       |), tl AS (
       |  SELECT source, lang AS top_lang FROM (
       |    SELECT source, lang,
       |      row_number() OVER (PARTITION BY source ORDER BY count(*) DESC, lang) AS rn
       |    FROM base GROUP BY source, lang
       |  ) WHERE rn = 1
       |)
       |SELECT p.source, n_docs, n_tokens,
       |  ${Exact.roundPortableSql("CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE)", 6)} AS mean_tokens,
       |  n_langs, top_lang,
       |  ${Exact.roundPortableSql("CAST(qs AS DOUBLE) / 1000000.0 / CAST(n_docs AS DOUBLE)", 6)} AS mean_quality
       |FROM per p JOIN tl USING (source)
       |ORDER BY source""".stripMargin) { (s, dir) =>
    Curation.sourceProfile(qualityDocs(s, dir), "source", "lang",
        col("tokens"), col("score"))
      .orderBy("source")
  }

  /** PII-style redaction over deterministically augmented text (the raw
    * corpus has nothing to mask): email + long-digit-run masking with a
    * mask count per doc.
    */
  val q94Redact: Q = Q(
    "q94_redact",
    """SELECT doc_id,
      |  md5(regexp_replace(
      |    regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<email>', 'g'),
      |    '[0-9]{4,}', '<num>', 'g')) AS red_fp,
      |  CAST(len(regexp_extract_all(t,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}|[0-9]{4,}')) AS BIGINT) AS n_redacted
      |FROM (
      |  SELECT doc_id,
      |    text || ' ref ' || CAST(doc_id * 31 + 1000000 AS VARCHAR)
      |         || ' user' || CAST(doc_id AS VARCHAR) || '@example.com' AS t
      |  FROM documents
      |)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.documentsSpread(s, dir)
      .select(col("doc_id"),
        concat(col("text"), lit(" ref "),
          (col("doc_id") * 31 + 1000000).cast("string"),
          lit(" user"), col("doc_id").cast("string"),
          lit("@example.com")).as("_t"))
      .select(col("doc_id"),
        md5(TextAnalysis.redact(col("_t"))).as("red_fp"),
        TextAnalysis.redactionCount(col("_t")).cast("long").as("n_redacted"))
      .orderBy("doc_id")
  }

  /** End-to-end curation pipeline: normalize → exact-dedup → quality
    * floor 0.5 → 8k-token greedy budget. The whole chain is mirrored in
    * one oracle query.
    */
  val q95CurationPipeline: Q = Q(
    "q95_curation_pipeline",
    s"""WITH n AS (
       |  SELECT doc_id,
       |    trim(regexp_replace(regexp_replace(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z0-9 .,!?'']', ' ', 'g'), ' +', ' ', 'g')) AS norm
       |  FROM documents
       |), k AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id,
       |      (doc_id = min(doc_id) OVER (PARTITION BY md5(norm))) AS is_keeper
       |    FROM n
       |  ) WHERE is_keeper
       |), q AS (
       |  $qualityDocsSql
       |), f AS (
       |  SELECT q.doc_id AS doc_id, q.score AS score, q.tokens AS tokens
       |  FROM q JOIN k USING (doc_id)
       |  WHERE q.score >= 0.5
       |)
       |SELECT doc_id, score, tokens,
       |  CAST(COALESCE(SUM(tokens) OVER (ORDER BY score DESC, doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before,
       |  CAST(COALESCE(SUM(tokens) OVER (ORDER BY score DESC, doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) < 8000 AS selected
       |FROM f
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Curation.curate(Tables.documentsSpread(s, dir), "doc_id", "text",
        Exact.roundPortable(TextAnalysis.qualityScore(col("text")), 4),
        size(TextAnalysis.tokens(col("text"))), 0.5, 8000L)
      .select("doc_id", "score", "tokens", "cum_before", "selected")
      .orderBy("doc_id")
  }

  /** Per-group exact quantiles next to the GK `percentile_approx` sketch:
    * the oracle checks the exact side; the sketch is checked by EXACT rank
    * bounds (approx p50 must land between exact p45 and p55 — GK with
    * accuracy 10000 guarantees rank error « n/10000).
    */
  val q96ApproxQuantiles: Q = {
    val ps = Seq("p45" -> 0.45, "p50" -> 0.5, "p55" -> 0.55,
      "p90" -> 0.9, "p95" -> 0.95, "p99" -> 0.99)
    val caseCols = ps.map { case (name, p) =>
      s"""    max(CASE WHEN rn = CAST(floor($p * (n_w - 1)) AS BIGINT) THEN v END) AS _lo_$name,
         |    max(CASE WHEN rn = CAST(ceil($p * (n_w - 1)) AS BIGINT) THEN v END) AS _hi_$name""".stripMargin
    }.mkString(",\n")
    val outCols = ps.map { case (name, p) =>
      s"  ${Exact.roundPortableSql(
        s"_lo_$name + ($p * (n - 1) - floor($p * (n - 1))) * (_hi_$name - _lo_$name)", 6)} AS $name"
    }.mkString(",\n")
    Q(
      "q96_approx_quantiles",
      s"""WITH r AS (
         |  SELECT event_type, value AS v,
         |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY value) - 1 AS BIGINT) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n_w
         |  FROM events WHERE NOT isnan(value)
         |), g AS (
         |  SELECT event_type, count(*) AS n,
         |$caseCols
         |  FROM r GROUP BY event_type
         |)
         |SELECT event_type, n,
         |$outCols,
         |  TRUE AS ok50, TRUE AS ok95
         |FROM g
         |ORDER BY event_type""".stripMargin) { (s, dir) =>
      import graft.ops.Quantiles
      val ev = Tables.events(s, dir).filter(!isnan(col("value")))
      val exact = Quantiles.perGroup(ev, "event_type", "value", ps)
      val approx = ev.groupBy("event_type")
        .agg(percentile_approx(col("value"),
          array(lit(0.5), lit(0.95)), lit(10000)).as("_ap"))
      exact.join(approx, "event_type")
        .select(col("event_type"), col("n"),
          col("p45"), col("p50"), col("p55"), col("p90"), col("p95"), col("p99"),
          (element_at(col("_ap"), 1) >= col("p45")
            && element_at(col("_ap"), 1) <= col("p55")).as("ok50"),
          (element_at(col("_ap"), 2) >= col("p90")
            && element_at(col("_ap"), 2) <= col("p99")).as("ok95"))
        .orderBy("event_type")
    }
  }

  /** Keep-best-of-cluster: near-dup connected components (q49's closure)
    * with the canonical chosen by QUALITY instead of min id — the dedup
    * decision a curation pipeline actually ships.
    */
  val q97KeepBest: Q = Q(
    "q97_keep_best",
    s"""WITH RECURSIVE pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM (SELECT doc_id, n_chars // 64 AS blk, list_distinct($DuckToks) AS toks FROM documents) a
       |  JOIN (SELECT doc_id, n_chars // 64 AS blk, list_distinct($DuckToks) AS toks FROM documents) b
       |    ON a.blk = b.blk AND a.doc_id < b.doc_id
       |  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
       |        / len(list_distinct(a.toks || b.toks)) >= 0.6
       |), edges AS (
       |  SELECT id_a AS s, id_b AS d FROM pairs
       |  UNION
       |  SELECT id_b AS s, id_a AS d FROM pairs
       |), reach(id, lbl) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.id WHERE r.lbl < e.d
       |), lab AS (
       |  SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id
       |), q AS (
       |  $qualityDocsSql
       |)
       |SELECT doc_id, cluster_id, score,
       |  (row_number() OVER (PARTITION BY cluster_id ORDER BY score DESC, doc_id) = 1) AS keep
       |FROM lab JOIN q USING (doc_id)
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
      .withColumn("_toks", array_distinct(TextAnalysis.tokens(col("text"))))
    val pairs = graft.ops.Dedup.jaccardPairs(docs, "doc_id", "_toks",
      expr("n_chars DIV 64"), 0.6, subBlocks = 0)
    val labeled = graft.ops.Cluster.clusters(
        Tables.documents(s, dir).select("doc_id"), "doc_id",
        pairs, "id_a", "id_b")
      .select("doc_id", "cluster_id")
      .join(qualityDocs(s, dir).select("doc_id", "score"), "doc_id")
    Curation.keepBestPerCluster(labeled, "cluster_id", "doc_id", col("score"))
      .select("doc_id", "cluster_id", "score", "keep")
      .orderBy("doc_id")
  }

  /** Per-language winsorization of document length to [p05, p95] — the
    * clamp-the-row outlier treatment next to q91's flag-the-row fences.
    * Oracle mirrors the type-7 rank bracketing + interpolation exactly.
    */
  val q104Winsorize: Q = {
    val (pLo, pHi) = (0.05, 0.95)
    def interp(p: Double, lo: String, hi: String) =
      s"$lo + ($p * (n - 1) - floor($p * (n - 1))) * ($hi - $lo)"
    Q(
      "q104_winsorize",
      s"""WITH r AS (
         |  SELECT doc_id, lang, CAST(n_chars AS DOUBLE) AS v,
         |    CAST(row_number() OVER (PARTITION BY lang ORDER BY CAST(n_chars AS DOUBLE)) - 1 AS BIGINT) AS rn,
         |    count(*) OVER (PARTITION BY lang) AS n_w
         |  FROM documents
         |), g AS (
         |  SELECT lang, count(*) AS n,
         |    max(CASE WHEN rn = CAST(floor($pLo * (n_w - 1)) AS BIGINT) THEN v END) AS _ll,
         |    max(CASE WHEN rn = CAST(ceil($pLo * (n_w - 1)) AS BIGINT) THEN v END) AS _lh,
         |    max(CASE WHEN rn = CAST(floor($pHi * (n_w - 1)) AS BIGINT) THEN v END) AS _hl,
         |    max(CASE WHEN rn = CAST(ceil($pHi * (n_w - 1)) AS BIGINT) THEN v END) AS _hh
         |  FROM r GROUP BY lang
         |), f AS (
         |  SELECT lang,
         |    ${interp(pLo, "_ll", "_lh")} AS lo_raw,
         |    ${interp(pHi, "_hl", "_hh")} AS hi_raw
         |  FROM g
         |)
         |SELECT doc_id, lang, v,
         |  ${Exact.roundPortableSql("lo_raw", 6)} AS lo,
         |  ${Exact.roundPortableSql("hi_raw", 6)} AS hi,
         |  ${Exact.roundPortableSql("least(greatest(v, lo_raw), hi_raw)", 6)} AS clipped
         |FROM r JOIN f USING (lang)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Curation.winsorize(Tables.documentsSpread(s, dir), "doc_id", "lang",
        col("n_chars"), pLo, pHi)
        .orderBy("doc_id")
    }
  }

  /** Source-share cap: each source keeps its best-first (longest-first)
    * prefix of docs while the source's cumulative chars stay within 20%
    * of the GLOBAL char total — the source-balancing selection rule. The
    * cap is pure integer arithmetic; the oracle replays the same per-group
    * cumulative window against the scalar total.
    */
  val q113SourceCap: Q = Q(
    "q113_source_cap",
    """WITH t AS (SELECT CAST(sum(n_chars) AS BIGINT) AS total FROM documents)
      |SELECT doc_id, source, cum_w,
      |  cum_w <= (SELECT (total * 200) // 1000 FROM t) AS kept
      |FROM (
      |  SELECT doc_id, source,
      |    CAST(sum(n_chars) OVER (
      |      PARTITION BY source ORDER BY n_chars DESC, doc_id) AS BIGINT) AS cum_w
      |  FROM documents
      |)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Curation.capSourceShare(Tables.documents(s, dir), "doc_id", "source",
        col("n_chars"), 200)
      .select("doc_id", "source", "cum_w", "kept")
      .orderBy("doc_id")
  }

  /** Length-bucket packing audit: per fixed batch-length bucket
    * (ceil(n_tok/16)·16), doc count, token total, and the padding the
    * bucket wastes — the length-grouped batching signal.
    */
  val q115LengthBuckets: Q = Q(
    "q115_length_buckets",
    s"""SELECT bucket_len, n_docs, sum_tok, padding,
       |  CASE WHEN bucket_len = 0 THEN CAST(0.0 AS DOUBLE)
       |       ELSE ${Exact.roundPortableSql(
                "CAST(padding AS DOUBLE) / CAST(bucket_len * n_docs AS DOUBLE)", 6)}
       |  END AS pad_frac
       |FROM (
       |  SELECT bucket_len, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(n_tok) AS BIGINT) AS sum_tok,
       |    CAST(bucket_len * count(*) - sum(n_tok) AS BIGINT) AS padding
       |  FROM (
       |    SELECT ((n_tok + 15) // 16) * 16 AS bucket_len, n_tok
       |    FROM (SELECT CAST(len($DuckToks) AS BIGINT) AS n_tok FROM documents)
       |  )
       |  GROUP BY bucket_len
       |)
       |ORDER BY bucket_len""".stripMargin) { (s, dir) =>
    Curation.lengthBuckets(Tables.documentsSpread(s, dir),
        size(TextAnalysis.tokens(col("text"))), 16)
      .orderBy("bucket_len")
  }

  /** Hybrid-retrieval reciprocal-rank fusion (Cormack SIGIR'09): the BM25
    * top-50 (relevance to the query terms) fused with the unigram-LM
    * top-50 (fluency prior) by Σ 1e6 DIV (60 + rank) — exact integer
    * contributions, so the fused ranking hash-matches. Both source
    * rankings, both rank windows, and the fused aggregate are replayed in
    * the oracle.
    */
  val q116RrfFusion: Q = {
    val terms = Seq("hash", "scan", "merge")
    val (k1, b) = (1.2, 0.75)
    val termList = terms.map(t => s"'$t'").mkString(", ")
    val avgdlSql = "(CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE))"
    val idfSql = Exact.roundPortableSql(
      "ln((CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1.0)", 6)
    val avgLpSql = Exact.roundPortableSql(
      "CAST(CAST(SUM(lpm) AS BIGINT) AS DOUBLE) / 1000000.0 / CAST(count(*) AS DOUBLE)", 6)
    Q(
      "q116_rrf_fusion",
      s"""WITH base AS (
         |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl
         |  FROM (SELECT doc_id, $DuckToks AS toks FROM documents)
         |), stats AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl FROM base
         |), tf AS (
         |  SELECT doc_id, dl, term, count(*) AS tf
         |  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM base)
         |  WHERE term IN ($termList)
         |  GROUP BY doc_id, dl, term
         |), dft AS (
         |  SELECT term, count(*) AS df FROM tf GROUP BY term
         |), scored AS (
         |  SELECT doc_id,
         |    CAST(floor($idfSql * (CAST(tf AS DOUBLE) * ${k1 + 1.0})
         |      / (CAST(tf AS DOUBLE) + (1.0 - $b + (CAST(dl AS DOUBLE) / $avgdlSql) * $b) * $k1)
         |      * 1000000.0 + 0.5) AS BIGINT) AS pm
         |  FROM tf JOIN dft USING (term), stats
         |), bm AS (
         |  SELECT doc_id, CAST(CAST(SUM(pm) AS BIGINT) AS DOUBLE) / 1000000.0 AS score
         |  FROM scored GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 50
         |), ra AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM bm
         |), tok AS (
         |  SELECT doc_id, unnest(toks) AS term FROM base
         |), lm AS (
         |  SELECT term, count(*) AS cnt FROM tok GROUP BY term
         |), tot AS (
         |  SELECT CAST(SUM(cnt) AS BIGINT) AS tot FROM lm
         |), lp AS (
         |  SELECT term,
         |    CAST(floor(ln(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS lpm
         |  FROM lm, tot
         |), dq AS (
         |  SELECT doc_id, $avgLpSql AS avg_lp
         |  FROM tok JOIN lp USING (term)
         |  GROUP BY doc_id
         |), rb AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY avg_lp DESC, doc_id) AS rank
         |  FROM (SELECT * FROM dq ORDER BY avg_lp DESC, doc_id LIMIT 50)
         |), contrib AS (
         |  SELECT doc_id, 1000000 // (60 + rank) AS c FROM ra
         |  UNION ALL
         |  SELECT doc_id, 1000000 // (60 + rank) AS c FROM rb
         |)
         |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS rrf_micros,
         |  CAST(count(*) AS BIGINT) AS n_lists
         |FROM contrib GROUP BY doc_id
         |ORDER BY rrf_micros DESC, doc_id LIMIT 20""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documentsSpread(s, dir)
      val bm = Scoring.bm25(docs.select(col("doc_id"), col("text")), "doc_id",
        TextAnalysis.tokens(col("text")), terms, k1, b, 50)
      // the rank windows run over 50-row TOP-K LISTS, not the corpus —
      // single-partition is the right plan for a driver-bounded list
      val ra = bm.withColumn("rank",
          row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
        .select("doc_id", "rank")
      val rb = Scoring.unigramLogProb(docs, "doc_id", TextAnalysis.tokens(col("text")))
        .orderBy(col("avg_lp").desc, col("doc_id")).limit(50)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("avg_lp").desc, col("doc_id"))))
        .select("doc_id", "rank")
      Scoring.rrfFuse(Seq(ra, rb), "doc_id", 60, 20)
        .orderBy(col("rrf_micros").desc, col("doc_id"))
    }
  }

  /** Moore-Lewis cross-entropy-difference selection: docs scored by mean
    * per-token log-likelihood ratio between the src0/src1 in-domain
    * unigram LM (add-one smoothed over the corpus vocabulary) and the
    * general corpus LM; `selected` = rounded score > 0.
    */
  val q118MooreLewis: Q = {
    val mlScoreSql = Exact.roundPortableSql(
      "CAST(CAST(SUM(d) AS BIGINT) AS DOUBLE) / 1000000.0 / CAST(count(*) AS DOUBLE)", 6)
    Q(
      "q118_moore_lewis",
      s"""WITH tok AS (
         |  SELECT doc_id, source IN ('src0', 'src1') AS ind, unnest(toks) AS term
         |  FROM (SELECT doc_id, source, $DuckToks AS toks FROM documents)
         |), gen AS (
         |  SELECT term, count(*) AS cnt FROM tok GROUP BY term
         |), ind AS (
         |  SELECT term, count(*) AS cnt_in FROM tok WHERE ind GROUP BY term
         |), sc AS (
         |  SELECT CAST(SUM(cnt) AS BIGINT) AS tot, CAST(count(*) AS BIGINT) AS v FROM gen
         |), sci AS (
         |  SELECT CAST(count(*) AS BIGINT) AS tot_in FROM tok WHERE ind
         |), ts AS (
         |  SELECT gen.term AS term,
         |    CAST(floor(ln(CAST(COALESCE(ind.cnt_in, 0) + 1 AS DOUBLE)
         |        / CAST(tot_in + v AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
         |    - CAST(floor(ln(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS d
         |  FROM gen LEFT JOIN ind ON gen.term = ind.term, sc, sci
         |)
         |SELECT doc_id, count(*) AS n_toks, $mlScoreSql AS ml_score,
         |  $mlScoreSql > 0.0 AS selected
         |FROM tok JOIN ts USING (term)
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Scoring.mooreLewis(Tables.documentsSpread(s, dir), "doc_id",
          TextAnalysis.tokens(col("text")),
          col("source").isin("src0", "src1"))
        .orderBy("doc_id")
    }
  }

  /** Mergeable-sketch incremental distinct (DataSketches HLL): one HLL
    * sketch per DAY of events, unioned into the month — the production
    * shape where each ingest batch persists a tiny sketch and any window's
    * distinct count is a register-max merge, never a re-scan. The
    * estimate is NOT partitioning-deterministic (sparse→dense promotion
    * depends on merge layout — CurationSpec shows 3007 vs 3011 on the
    * same data), so only the verified 5% ENVELOPE crosses the gate
    * boundary, never the estimate itself (lgConfigK=12 → ~1.6% rse).
    */
  val q127HllMerge: Q = Q(
    "q127_hll_merge",
    """SELECT CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
      |  count(DISTINCT user_id) AS exact_users,
      |  TRUE AS merged_ok
      |FROM events""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val daily = ev.groupBy(to_date(col("ts")).as("_day"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("_sk"))
    val merged = daily.agg(
      count(lit(1)).as("n_days"),
      hll_sketch_estimate(hll_union_agg(col("_sk"))).as("_est"))
    val exact = ev.agg(count_distinct(col("user_id")).as("exact_users"))
    exact.crossJoin(merged)
      .select(col("n_days"), col("exact_users"),
        (abs(col("_est") - col("exact_users")).cast("double")
          <= greatest(col("exact_users").cast("double") * 0.05, lit(5.0)))
          .as("merged_ok"))
  }

  /** DSIR hashed-bigram importance resampling (Xie et al. NeurIPS'23):
    * target = src2/src3 docs, raw = whole corpus, 4096 feature buckets,
    * Gumbel-top-100 selection. The oracle mirrors the hash, both
    * smoothed per-bucket logs, the exact long sums, and the seeded
    * Gumbel key bit-for-bit.
    */
  val q122Dsir: Q = {
    val b = 4096
    val gumbelSql =
      s"""CAST(floor(-ln(-ln((CAST(${duckHash("dsir_g", "CAST(doc_id AS VARCHAR)")} AS DOUBLE) + 0.5)
         |      / 1152921504606846976.0)) * 1000000 + 0.5) AS BIGINT)""".stripMargin
    Q(
      "q122_dsir_select",
      s"""WITH bp AS (
         |  SELECT doc_id, t, ${duckHash("dsir", "bigram")} % $b AS bucket
         |  FROM (
         |    SELECT doc_id, source IN ('src2', 'src3') AS t,
         |      unnest($DuckBigrams) AS bigram
         |    FROM (SELECT doc_id, source, $DuckToks AS l FROM documents))
         |), raw AS (
         |  SELECT bucket, count(*) AS cr FROM bp GROUP BY bucket
         |), tgt AS (
         |  SELECT bucket, count(*) AS ct FROM bp WHERE t GROUP BY bucket
         |), sc AS (SELECT CAST(count(*) AS BIGINT) AS nr FROM bp),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM bp WHERE t),
         |bs AS (
         |  SELECT raw.bucket AS bucket,
         |    CAST(floor(ln(CAST(COALESCE(tgt.ct, 0) + 1 AS DOUBLE)
         |        / CAST(nt + $b AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
         |    - CAST(floor(ln(CAST(raw.cr + 1 AS DOUBLE)
         |        / CAST(nr + $b AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS lr
         |  FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket, sc, st
         |), pd AS (
         |  SELECT doc_id, count(*) AS n_feat, CAST(SUM(lr) AS BIGINT) AS w_micros
         |  FROM bp JOIN bs USING (bucket) GROUP BY doc_id
         |), kd AS (
         |  SELECT doc_id, n_feat, w_micros, w_micros + $gumbelSql AS key_micros
         |  FROM pd
         |)
         |SELECT doc_id, n_feat, w_micros, key_micros,
         |  rank() OVER (ORDER BY key_micros DESC, doc_id) <= 100 AS selected
         |FROM kd
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Scoring.dsirSelect(Tables.documentsSpread(s, dir), "doc_id",
          TextAnalysis.tokens(col("text")),
          col("source").isin("src2", "src3"), buckets = b, k = 100)
        .orderBy("doc_id")
    }
  }

  /** CCNet perplexity terciles (Wenzek LREC'20): per-language unigram LM
    * score, head/middle/tail ntile(3) per language.
    */
  val q123CcnetBuckets: Q = Q(
    "q123_ccnet_buckets",
    s"""WITH tok AS (
       |  SELECT doc_id, lang, unnest(toks) AS term
       |  FROM (SELECT doc_id, lang, $DuckToks AS toks FROM documents)
       |), lm AS (
       |  SELECT lang, term, count(*) AS cnt FROM tok GROUP BY lang, term
       |), tot AS (
       |  SELECT lang, CAST(SUM(cnt) AS BIGINT) AS tot FROM lm GROUP BY lang
       |), lp AS (
       |  SELECT lm.lang AS lang, term,
       |    CAST(floor(ln(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS lpm
       |  FROM lm JOIN tot ON lm.lang = tot.lang
       |), pd AS (
       |  SELECT doc_id, lang, count(*) AS n_toks,
       |    ${Exact.roundPortableSql(
              "CAST(CAST(SUM(lpm) AS BIGINT) AS DOUBLE) / 1000000.0 / CAST(count(*) AS DOUBLE)", 6)} AS avg_lp
       |  FROM tok JOIN lp USING (lang, term)
       |  GROUP BY doc_id, lang
       |)
       |SELECT doc_id, lang, n_toks, avg_lp, bucket,
       |  CASE WHEN bucket = 1 THEN 'head' WHEN bucket = 2 THEN 'middle'
       |    ELSE 'tail' END AS label
       |FROM (
       |  SELECT *, CAST(ntile(3) OVER (PARTITION BY lang
       |    ORDER BY avg_lp DESC, doc_id) AS BIGINT) AS bucket
       |  FROM pd)
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Scoring.ccnetBuckets(Tables.documentsSpread(s, dir), "doc_id", "lang",
        TextAnalysis.tokens(col("text")))
      .orderBy("doc_id")
  }

  /** Small-file compaction plan: documents as a file manifest (doc_id =
    * file, n_chars = bytes), packed into 4 KiB output bins by the
    * distributed exclusive prefix sum; bin = cum_before DIV target.
    */
  val q120CompactionPlan: Q = Q(
    "q120_compaction_plan",
    """SELECT doc_id, bytes, cum_before, cum_before // 4096 AS bin FROM (
      |  SELECT doc_id, n_chars AS bytes,
      |    CAST(COALESCE(SUM(n_chars) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    graft.ops.Compaction.plan(
        Tables.documents(s, dir).select(col("doc_id"), col("n_chars").as("bytes")),
        "doc_id", "bytes", 4096L)
      .select("doc_id", "bytes", "cum_before", "bin")
      .orderBy("doc_id")
  }

  /** Per-source quantile normalization: calibrate every source's score
    * distribution onto the pooled corpus distribution (norm = the global
    * order statistic at the doc's within-source percent rank), so one
    * quality threshold means the same thing across sources. The oracle
    * replays the percent rank, the portable round-half-up index, and the
    * pooled ranking.
    */
  val q161QuantileNorm: Q = Q(
    "q161_quantile_norm",
    """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
      |r AS (
      |  SELECT doc_id, source, n_chars,
      |    percent_rank() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS pr
      |  FROM d
      |), g AS (
      |  SELECT n_chars AS gscore,
      |    row_number() OVER (ORDER BY n_chars, doc_id) AS gidx
      |  FROM d
      |), n AS (SELECT count(*) AS n FROM d)
      |SELECT r.doc_id, r.source, r.n_chars,
      |  CAST(g.gscore AS BIGINT) AS norm_n_chars
      |FROM r CROSS JOIN n
      |JOIN g ON g.gidx = CAST(floor(r.pr * (n.n - 1) + 0.5) AS BIGINT) + 1
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    graft.ops.Calibrate.quantileNormalize(
        Tables.documentsSpread(s, dir), "doc_id", "source", "n_chars")
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("norm_n_chars"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(q80Decontaminate, q81TokenBudget, q82DupSpans,
    q83DomainMixture, q84QualityBands, q85ApproxDistinct, q86DocChunks,
    q87Bm25, q88UnigramLogprob, q89IncrementalDedup, q90MixtureSample,
    q91IqrOutliers, q92Normalize, q93SourceProfile, q94Redact,
    q95CurationPipeline, q96ApproxQuantiles, q97KeepBest, q104Winsorize,
    q113SourceCap, q115LengthBuckets, q116RrfFusion, q118MooreLewis,
    q120CompactionPlan, q122Dsir, q123CcnetBuckets, q127HllMerge,
    q161QuantileNorm)
}
