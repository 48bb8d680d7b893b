package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Hashing, TextAnalysis}

/** Text-analysis operators over the `documents` table: tokenization census,
  * language-ID, quality scoring, document fingerprinting. All shuffle-light
  * (one groupBy at most) and fully codegen'd.
  */
object TextQueries {

  /** DuckDB token expression matching TextAnalysis.tokens for the
    * single-space [a-z ] corpus.
    */
  private val DuckToks = "list_filter(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' '), t -> len(t) > 0)"

  /** Per-language corpus census: doc counts and exact token statistics. */
  val q20TextStats: Q = Q(
    "q20_text_stats",
    s"""SELECT lang, count(*) AS n_docs,
       |  CAST(sum(len($DuckToks)) AS BIGINT) AS total_tokens,
       |  CAST(sum(len(list_distinct($DuckToks))) AS BIGINT) AS total_distinct_tokens,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |  CAST(floor((CAST(sum(len($DuckToks)) AS DOUBLE) / count(*)) * 10000 + 0.5) AS BIGINT) / CAST(10000 AS DOUBLE) AS avg_tokens_per_doc
       |FROM documents
       |GROUP BY lang
       |ORDER BY lang""".stripMargin) { (s, dir) =>
    val toks = TextAnalysis.tokens(col("text"))
    Tables.documentsSpread(s, dir)
      .withColumn("_n_tok", size(toks))
      .withColumn("_n_dist", size(array_distinct(toks)))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("_n_tok").as("total_tokens"),
        sum("_n_dist").as("total_distinct_tokens"),
        sum("n_chars").as("total_chars"),
        graft.functions.Exact.roundPortable(sum("_n_tok").cast("double") / count(lit(1)), 4).as("avg_tokens_per_doc"))
      .orderBy("lang")
  }

  /** Regex token-class census per document (BPE-ish pre-tokenization). */
  val q21TokenClasses: Q = Q(
    "q21_token_classes",
    """SELECT doc_id,
      |  len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z]+')) AS n_alpha,
      |  len(list_distinct(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z]+'))) AS n_alpha_distinct,
      |  len(regexp_extract_all(text, '[0-9]+')) AS n_num,
      |  length(text) AS n_chars_measured
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.documentsSpread(s, dir).select(
      col("doc_id"),
      size(TextAnalysis.alphaTokens(col("text"))).as("n_alpha"),
      size(array_distinct(TextAnalysis.alphaTokens(col("text")))).as("n_alpha_distinct"),
      size(TextAnalysis.numTokens(col("text"))).as("n_num"),
      length(col("text")).as("n_chars_measured"))
      .orderBy("doc_id")
  }

  /** Shared stopword language-ID encoding (q22 emits it row-wise; q165
    * folds it into the agreement statistic): argmax with
    * lexicographic-first tiebreak, encoded portably as
    * `max(hits * 8 + reversed-lang-rank)` so both engines agree
    * bit-for-bit.
    */
  private object LangIdHeur {
    val langs: Seq[(String, Seq[String])] =
      TextAnalysis.Stopwords.toSeq.sortBy(_._1) // de, en, es, fr, zh
    val k: Int = langs.size
    private def duckHits(words: Seq[String]): String =
      s"len(list_filter($DuckToks, t -> t IN (${words.map(w => s"'$w'").mkString(",")})))"
    val codesSql: String = langs.zipWithIndex.map { case ((_, ws), i) =>
      s"${duckHits(ws)} * 8 + ${k - 1 - i}"
    }.mkString("greatest(", ", ", ")")
    val langCaseSql: String = langs.zipWithIndex.map { case ((l, _), i) =>
      s"WHEN ${k - 1 - i} THEN '$l'"
    }.mkString("CASE best_code % 8 ", " ", " END")
    val predSql: String =
      s"CASE WHEN best_code // 8 > 0 THEN $langCaseSql ELSE 'und' END"
    /** Spark twin: (doc_id, lang, pred_lang) from documents. */
    def pred(s: org.apache.spark.sql.SparkSession, dir: String)
        : org.apache.spark.sql.DataFrame = {
      val toks = TextAnalysis.tokens(col("text"))
      val codes = langs.zipWithIndex.map { case ((_, words), i) =>
        TextAnalysis.lexiconHits(toks, words).cast("long") * 8 + (k - 1 - i)
      }
      val predLang = langs.zipWithIndex
        .foldLeft(lit(null).cast("string")) { case (acc, ((l, _), i)) =>
          when(col("_best_code") % 8 === (k - 1 - i), lit(l)).otherwise(acc)
        }
      Tables.documentsSpread(s, dir)
        .withColumn("_best_code", greatest(codes: _*))
        .withColumn("_score", expr("_best_code DIV 8"))
        .withColumn("pred_lang", when(col("_score") > 0, predLang).otherwise("und"))
    }
  }

  val q22LangId: Q = {
    import LangIdHeur.{codesSql, langCaseSql}
    Q(
      "q22_lang_id",
      s"""SELECT doc_id, lang,
         |  CASE WHEN best_code // 8 > 0 THEN $langCaseSql ELSE 'und' END AS pred_lang,
         |  best_code // 8 AS score,
         |  (lang = CASE WHEN best_code // 8 > 0 THEN $langCaseSql ELSE 'und' END) AS agree
         |FROM (SELECT doc_id, lang, $codesSql AS best_code FROM documents)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      LangIdHeur.pred(s, dir)
        .select(
          col("doc_id"), col("lang"), col("pred_lang"),
          col("_score").as("score"),
          (col("lang") === col("pred_lang")).as("agree"))
        .orderBy("doc_id")
    }
  }

  /** Deterministic quality score per document (see TextAnalysis scaladoc). */
  val q23QualityScore: Q = {
    val allStop = TextAnalysis.Stopwords.values.flatten.toSeq.distinct.sorted
    val stopList = allStop.map(w => s"'$w'").mkString(",")
    Q(
      "q23_quality_score",
      s"""SELECT doc_id, CAST(floor(q * 10000 + 0.5) AS BIGINT) / CAST(10000 AS DOUBLE) AS quality FROM (
         |  SELECT doc_id,
         |    (least(CAST(2.0 AS DOUBLE) * len(list_filter(toks, t -> t IN ($stopList))) / greatest(CAST(len(toks) AS DOUBLE), CAST(1.0 AS DOUBLE)), CAST(1.0 AS DOUBLE))
         |     + length(regexp_replace(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z]', '', 'g')) / greatest(CAST(length(text) AS DOUBLE), CAST(1.0 AS DOUBLE))
         |     + CASE WHEN mtl >= 3 AND mtl <= 12 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
         |     + least(CAST(len(toks) AS DOUBLE) / CAST(200.0 AS DOUBLE), CAST(1.0 AS DOUBLE))) / CAST(4.0 AS DOUBLE) AS q
         |  FROM (
         |    SELECT doc_id, text, toks,
         |      CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / greatest(CAST(len(toks) AS DOUBLE), CAST(1.0 AS DOUBLE)) AS mtl
         |    FROM (SELECT doc_id, text, $DuckToks AS toks FROM documents)
         |  )
         |)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables.documentsSpread(s, dir)
        .select(col("doc_id"),
          graft.functions.Exact.roundPortable(TextAnalysis.qualityScore(col("text")), 4).as("quality"))
        .orderBy("doc_id")
    }
  }

  /** Document fingerprint: min 60-bit hash over distinct word 3-gram
    * shingles (winnowing-style representative).
    */
  val q24DocFingerprint: Q = Q(
    "q24_doc_fingerprint",
    """SELECT doc_id, n_shingles,
      |  CASE WHEN n_shingles > 0 THEN
      |    list_min(list_transform(sh, s -> CAST(('0x' || substring(md5('fp1' || ':' || s), 1, 15)) AS BIGINT)))
      |  END AS fp_min
      |FROM (
      |  SELECT doc_id, len(sh) AS n_shingles, sh FROM (
      |    SELECT doc_id,
      |      list_distinct(list_transform(
      |        generate_series(1, greatest(len(toks) - 2, 0)),
      |        i -> array_to_string(toks[i:i+2], ' '))) AS sh
      |    FROM (SELECT doc_id, list_filter(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' '), t -> len(t) > 0) AS toks FROM documents)
      |  )
      |)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val sh = graft.functions.WordShinglesExpr(col("text"), 3)
    Tables.documentsSpread(s, dir)
      .select(col("doc_id"), size(sh).as("n_shingles"),
        when(size(sh) > 0, TextAnalysis.docFingerprint(sh, "fp1")).as("fp_min"))
      .orderBy("doc_id")
  }

  /** TF-IDF top-3 terms per document (smoothed idf, portable rounding —
    * see TfIdf scaladoc for the scale shape and why idf is rounded before
    * scoring).
    */
  val q50TfIdfTopTerms: Q = Q(
    "q50_tfidf_top_terms",
    s"""WITH toks AS (
       |  SELECT doc_id, unnest($DuckToks) AS term FROM documents
       |), tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
       |), dft AS (
       |  SELECT term, count(*) AS df FROM tf GROUP BY term
       |), n AS (
       |  SELECT count(*) AS n FROM documents
       |), scored AS (
       |  SELECT doc_id, term, tf, df,
       |    CAST(floor(tf * (CAST(floor((ln(CAST(n + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE)) + 1.0) * 1000000 + 0.5) AS BIGINT) / CAST(1000000 AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) / CAST(1000000 AS DOUBLE) AS score
       |  FROM tf JOIN dft USING (term) CROSS JOIN n
       |), ranked AS (
       |  SELECT doc_id, term, tf, df, score,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
       |  FROM scored
       |)
       |SELECT doc_id, term, tf, df, score, rank FROM ranked WHERE rank <= 3
       |ORDER BY doc_id, rank""".stripMargin) { (s, dir) =>
    graft.ops.TfIdf.topTerms(Tables.documentsSpread(s, dir), "doc_id",
      TextAnalysis.tokens(col("text")), 3)
      .orderBy("doc_id", "rank")
  }

  /** Exact global heavy hitters: top-20 terms by corpus frequency with
    * document frequency, ties broken by term (total order).
    */
  val q52HeavyHitters: Q = Q(
    "q52_heavy_hitters",
    s"""SELECT term, count(*) AS freq, count(DISTINCT doc_id) AS df
       |FROM (SELECT doc_id, unnest($DuckToks) AS term FROM documents)
       |GROUP BY term
       |ORDER BY freq DESC, term
       |LIMIT 20""".stripMargin) { (s, dir) =>
    graft.ops.TfIdf.heavyHitters(Tables.documentsSpread(s, dir), "doc_id",
      TextAnalysis.tokens(col("text")), 20)
  }

  /** Count-min sketch estimates for the exact top-20 terms, hash-gated:
    * the sketch's bucket hash is the portable md5 form, so the oracle
    * replays sketch construction cell by cell and the min-across-rows
    * estimates bit-for-bit. At width 8192 ≫ distinct terms the estimates
    * equal the true counts here; CountMinSpec covers the collision regime.
    */
  val q61CountMinEstimates: Q = {
    val depth = 4; val width = 8192; val seed = "cms2"
    def duckBucket(r: String, term: String): String =
      s"CAST(('0x' || substring(md5('$seed:' || $r || ':' || $term), 1, 15)) AS BIGINT) % $width"
    Q(
      "q61_countmin_estimates",
      s"""WITH toks AS (
         |  SELECT unnest($DuckToks) AS term FROM documents
         |), cells AS (
         |  SELECT r, ${duckBucket("CAST(r AS VARCHAR)", "term")} AS b,
         |    count(*) AS cell_count
         |  FROM toks, generate_series(0, ${depth - 1}) t(r)
         |  GROUP BY 1, 2
         |), exact AS (
         |  SELECT term, count(*) AS true_count FROM toks GROUP BY term
         |  ORDER BY true_count DESC, term LIMIT 20
         |), est AS (
         |  SELECT e.term, min(c.cell_count) AS est_count
         |  FROM exact e
         |  CROSS JOIN generate_series(0, ${depth - 1}) t(r)
         |  JOIN cells c ON c.r = t.r
         |    AND c.b = ${duckBucket("CAST(t.r AS VARCHAR)", "e.term")}
         |  GROUP BY e.term
         |)
         |SELECT term, est_count, true_count FROM est JOIN exact USING (term)
         |ORDER BY term""".stripMargin) { (s, dir) =>
      val toks = Tables.documentsSpread(s, dir)
        .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sk = graft.ops.CountMin.sketch(toks, "term", depth, width, seed)
      val exact = toks.groupBy("term").agg(count(lit(1)).as("true_count"))
        .orderBy(col("true_count").desc, col("term")).limit(20)
      graft.ops.Pins.sealOutput(
        graft.ops.CountMin.estimate(sk, exact.select("term"), "term", depth, width, seed)
          .join(exact, "term")
          .select("term", "est_count", "true_count")
          .orderBy("term"),
        toks)
    }
  }

  /** Passage-level boilerplate removal (ops/Boilerplate): 8-token
    * passages recurring in ≥3 distinct docs are template text; each doc
    * reports its passage census and the cleaned text rebuilt in order
    * (null when everything was boilerplate — the oracle's null-skipping
    * string_agg states the same).
    */
  val q62Boilerplate: Q = Q(
    "q62_boilerplate",
    s"""WITH d AS (
       |  SELECT doc_id, $DuckToks AS toks FROM documents
       |), si AS (
       |  SELECT doc_id, toks,
       |    unnest(generate_series(0, (len(toks) + 7) // 8 - 1)) AS seg_idx
       |  FROM d WHERE len(toks) > 0
       |), segs AS (
       |  SELECT doc_id, seg_idx,
       |    array_to_string(toks[seg_idx * 8 + 1 : seg_idx * 8 + 8], ' ') AS seg
       |  FROM si
       |), bp AS (
       |  SELECT seg FROM segs GROUP BY seg HAVING count(DISTINCT doc_id) >= 3
       |)
       |SELECT s.doc_id, count(*) AS n_segments,
       |  CAST(sum(CASE WHEN b.seg IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boilerplate,
       |  string_agg(CASE WHEN b.seg IS NULL THEN s.seg END, ' ' ORDER BY s.seg_idx) AS clean_text
       |FROM segs s LEFT JOIN bp b USING (seg)
       |GROUP BY s.doc_id
       |ORDER BY s.doc_id""".stripMargin) { (s, dir) =>
    graft.ops.Boilerplate.clean(Tables.documentsSpread(s, dir), "doc_id",
      TextAnalysis.tokens(col("text")), width = 8, minDocs = 3)
      .orderBy("doc_id")
  }

  /** GPT-style sequence packing: documents concatenated in doc_id order
    * and cut into fixed 512-token training chunks — each doc's global
    * start offset comes from the DISTRIBUTED two-pass prefix sum
    * (ops/PrefixSum), not a global window (which would move the whole
    * corpus to one reducer). The oracle states the same offsets with a
    * windowed running sum.
    */
  val q63SequencePacking: Q = Q(
    "q63_sequence_packing",
    s"""WITH d AS (
       |  SELECT doc_id, len($DuckToks) AS n_tok FROM documents
       |), c AS (
       |  SELECT doc_id, n_tok,
       |    CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
       |  FROM d
       |)
       |SELECT doc_id, n_tok, start_offset,
       |  start_offset // 512 AS first_chunk,
       |  (start_offset + n_tok - 1) // 512 AS last_chunk,
       |  (start_offset + n_tok - 1) // 512 - start_offset // 512 + 1 AS n_chunks
       |FROM c
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val d = Tables.documentsSpread(s, dir)
      .select(col("doc_id"), size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
    graft.ops.PrefixSum.exclusive(d, "doc_id", "n_tok", "start_offset")
      .withColumn("first_chunk", expr("start_offset DIV 512"))
      .withColumn("last_chunk", expr("(start_offset + n_tok - 1) DIV 512"))
      .withColumn("n_chunks", col("last_chunk") - col("first_chunk") + 1)
      .orderBy("doc_id")
  }

  /** Sparse tf-cosine near-dup pairs (the sparse-vector complement of the
    * dense-embedding q30): inverted-index equi-join on terms with df ≤ 10%
    * of the corpus (corpus-relative cap — the gate keeps the same meaning
    * at every sf), exact integer dots, IEEE sqrt/÷ norms — no all-pairs.
    */
  val q103SparseCosine: Q = {
    val (perMille, minSim) = (100, 0.8)
    Q(
      "q103_sparse_cosine",
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($DuckToks) AS term FROM documents
         |), tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
         |), kept AS (
         |  SELECT tf.doc_id, tf.term, tf.tf FROM tf
         |  JOIN (SELECT term FROM tf GROUP BY term
         |        HAVING count(*) <= ((SELECT count(*) FROM documents) * $perMille + 999) // 1000) d
         |    USING (term)
         |), norms AS (
         |  SELECT doc_id, sqrt(CAST(sum(tf * tf) AS DOUBLE)) AS nrm FROM kept GROUP BY doc_id
         |), dots AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.tf * b.tf) AS dot
         |  FROM kept a JOIN kept b ON a.term = b.term AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT id_a, id_b,
         |  CAST(floor(CAST(dot AS DOUBLE) / (na.nrm * nb.nrm) * 1000000 + 0.5) AS BIGINT) / CAST(1000000 AS DOUBLE) AS sim
         |FROM dots
         |JOIN norms na ON na.doc_id = id_a
         |JOIN norms nb ON nb.doc_id = id_b
         |WHERE CAST(dot AS DOUBLE) / (na.nrm * nb.nrm) >= $minSim
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      graft.ops.TfIdf.sparseCosinePairs(Tables.documentsSpread(s, dir),
        "doc_id", TextAnalysis.tokens(col("text")), perMille, minSim)
        .orderBy("id_a", "id_b")
    }
  }

  /** Blocklist filtering (ops/Curation.blocklistFilter — the C4 badwords
    * rule): per-doc lexicon hit count + flag, lexicon as a codegen'd
    * literal (the decontaminate/BloomJoin shape takes over for lexicons
    * too big for a literal).
    */
  val q109Blocklist: Q = Q(
    "q109_blocklist",
    s"""SELECT doc_id,
       |  CAST(len(list_filter($DuckToks, t -> t IN ('slow','broken','spam'))) AS BIGINT) AS n_hits,
       |  (len(list_filter($DuckToks, t -> t IN ('slow','broken','spam'))) > 0) AS flagged
       |FROM documents
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    graft.ops.Curation.blocklistFilter(Tables.documentsSpread(s, dir),
        "doc_id", TextAnalysis.tokens(col("text")),
        Seq("slow", "broken", "spam"))
      .select("doc_id", "n_hits", "flagged")
      .orderBy("doc_id")
  }

  /** HTML → text extraction over deterministically synthesized markup
    * (the raw corpus is plain text, so the gate WRAPS each doc in
    * head/style/script/entity-bearing HTML first — the q94 augmentation
    * trick): script/style subtrees dropped, block closers → breaks, tags
    * stripped, entities decoded, whitespace squashed. The oracle builds
    * the same markup and mirrors the regex chain in RE2.
    */
  val q128HtmlExtract: Q = Q(
    "q128_html_extract",
    """SELECT doc_id, md5(txt) AS text_fp, CAST(length(txt) AS BIGINT) AS text_len
      |FROM (
      |  SELECT doc_id, trim(regexp_replace(
      |    replace(replace(replace(replace(replace(replace(
      |      regexp_replace(
      |        regexp_replace(
      |          regexp_replace(html, '(?is)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g'),
      |          '(?i)</(p|div|h[1-6]|li|tr)>|<br[^>]*>', chr(10), 'g'),
      |        '<[^>]+>', ' ', 'g'),
      |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
      |      '&nbsp;', ' '), '&amp;', '&'),
      |    '[ \t\r\n]+', ' ', 'g')) AS txt
      |  FROM (
      |    SELECT doc_id,
      |      '<html><head><style>p{color:red}</style></head><body><h1>Doc '
      |      || CAST(doc_id AS VARCHAR) || '</h1><p>'
      |      || replace(text, ' the ', ' &amp; ')
      |      || '</p><script>var x = 1 < 2;</script></body></html>' AS html
      |    FROM documents)
      |)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val html = concat(
      lit("<html><head><style>p{color:red}</style></head><body><h1>Doc "),
      col("doc_id").cast("string"), lit("</h1><p>"),
      regexp_replace(col("text"), " the ", " &amp; "),
      lit("</p><script>var x = 1 < 2;</script></body></html>"))
    Tables.documentsSpread(s, dir)
      .select(col("doc_id"), TextAnalysis.htmlToText(html).as("_txt"))
      .select(col("doc_id"), md5(col("_txt")).as("text_fp"),
        length(col("_txt")).cast("long").as("text_len"))
      .orderBy("doc_id")
  }

  /** Unicode NFC normalization (native [[graft.functions.UnicodeNormalize]]
    * kernel vs DuckDB `nfc_normalize`): the corpus is ASCII, so the gate
    * appends decomposed sequences (e+U+0301, i+U+0308) plus an
    * already-composed é — the fingerprint proves composition happened
    * (1-codepoint é) and idempotence; raw vs NFC lengths differ by
    * exactly the two combining marks.
    */
  val q129NfcNormalize: Q = Q(
    "q129_nfc_normalize",
    """SELECT doc_id, md5(nfc) AS nfc_fp,
      |  CAST(length(raw) AS BIGINT) AS n_chars_raw,
      |  CAST(length(nfc) AS BIGINT) AS n_chars_nfc
      |FROM (
      |  SELECT doc_id, raw, nfc_normalize(raw) AS nfc FROM (
      |    SELECT doc_id,
      |      text || ' caf' || 'e' || chr(769) || ' nai' || 'i' || chr(776)
      |        || 've ' || chr(233) AS raw
      |    FROM documents)
      |)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    // the three lit()s below carry REAL codepoints: e+U+0301 and i+U+0308
    // (decomposed), then a precomposed U+00E9 - mirrors the oracle chr() calls
    val raw = concat(col("text"), lit(" caf"), lit("é"), lit(" nai"),
      lit("ï"), lit("ve "), lit("é"))
    Tables.documentsSpread(s, dir)
      .select(col("doc_id"), raw.as("_raw"),
        graft.functions.UnicodeNormalize(raw, "NFC").as("_nfc"))
      .select(col("doc_id"), md5(col("_nfc")).as("nfc_fp"),
        length(col("_raw")).cast("long").as("n_chars_raw"),
        length(col("_nfc")).cast("long").as("n_chars_nfc"))
      .orderBy("doc_id")
  }

  /** Deterministic data augmentation: seeded ~10% token dropout — the
    * reproducible form of the text-augmentation pass (random dropout would
    * make every training corpus rebuild different). Token at 0-based
    * position i survives iff hash60("doc:i") % 10 != 0, a pure function of
    * (doc, position) the oracle replays with an index lambda.
    */
  val q164Augment: Q = {
    def duckHash(seed: String, e: String): String =
      s"CAST(('0x' || substring(md5('$seed' || ':' || $e), 1, 15)) AS BIGINT)"
    Q(
      "q164_augment",
      s"""SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks,
         |  CAST(len(kept) AS BIGINT) AS n_kept,
         |  array_to_string(kept, ' ') AS aug_text
         |FROM (
         |  SELECT doc_id, toks,
         |    list_filter(toks, (t, i) ->
         |      ${duckHash("augdrop", "CAST(doc_id AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR)")} % 10 != 0) AS kept
         |  FROM (SELECT doc_id, $DuckToks AS toks FROM documents)
         |)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.functions.Hashing
      val toks = TextAnalysis.tokens(col("text"))
      Tables.documentsSpread(s, dir)
        .withColumn("_toks", toks)
        .withColumn("_kept", filter(col("_toks"), (_, i) =>
          Hashing.hash60(
            concat(col("doc_id").cast("string"), lit(":"), i.cast("string")),
            "augdrop") % 10 =!= 0))
        .select(col("doc_id"),
          size(col("_toks")).cast("long").as("n_toks"),
          size(col("_kept")).cast("long").as("n_kept"),
          concat_ws(" ", col("_kept")).as("aug_text"))
        .orderBy("doc_id")
    }
  }

  /** Cohen's kappa between the stopword langID heuristic and the gold
    * label — chance-corrected agreement, the metric that tells a curation
    * team whether a cheap labeler beats guessing before it gates a corpus.
    * All inputs are integer confusion counts; kappa_e6 uses a fixed IEEE
    * sequence both engines compute identically.
    */
  val q165Kappa: Q = {
    import LangIdHeur.{codesSql, predSql}
    Q(
      "q165_labeler_kappa",
      s"""WITH pred AS (
         |  SELECT lang, $predSql AS pred_lang
         |  FROM (SELECT lang, $codesSql AS best_code FROM documents)
         |), conf AS (SELECT lang, pred_lang, count(*) AS n FROM pred GROUP BY 1, 2),
         |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM conf),
         |diag AS (
         |  SELECT CAST(coalesce(SUM(n), 0) AS BIGINT) AS d FROM conf
         |  WHERE lang = pred_lang
         |), rt AS (SELECT lang AS lbl, CAST(SUM(n) AS BIGINT) AS r FROM conf GROUP BY 1),
         |ct AS (SELECT pred_lang AS lbl, CAST(SUM(n) AS BIGINT) AS c FROM conf GROUP BY 1),
         |rc AS (SELECT CAST(coalesce(SUM(r * c), 0) AS BIGINT) AS rc FROM rt JOIN ct USING (lbl))
         |SELECT tot.nn AS n_docs, diag.d AS sum_diag, rc.rc AS sum_rowcol,
         |  CAST(floor(1000000.0 * (tot.nn * diag.d - rc.rc)
         |    / (tot.nn * tot.nn - rc.rc) + 0.5) AS BIGINT) AS kappa_e6
         |FROM tot, diag, rc""".stripMargin) { (s, dir) =>
      val pred = LangIdHeur.pred(s, dir).select(col("lang"), col("pred_lang"))
      // localCheckpoint, not persist: |classes|²-row table, materialized
      // once and GC-freed — no cached table outlives the gate
      val conf = pred.groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val tot = conf.agg(sum("n").as("nn"))
      val diag = conf.where(col("lang") === col("pred_lang"))
        .agg(coalesce(sum("n"), lit(0L)).as("d"))
      val rt = conf.groupBy(col("lang").as("lbl")).agg(sum("n").as("r"))
      val ct = conf.groupBy(col("pred_lang").as("lbl")).agg(sum("n").as("c"))
      val rc = rt.join(ct, "lbl")
        .agg(coalesce(sum(col("r") * col("c")), lit(0L)).as("rc"))
      tot.crossJoin(diag).crossJoin(rc)
        .select(col("nn").as("n_docs"), col("d").as("sum_diag"),
          col("rc").as("sum_rowcol"),
          floor(lit(1000000.0) * (col("nn") * col("d") - col("rc"))
            / (col("nn") * col("nn") - col("rc")) + 0.5)
            .cast("long").as("kappa_e6"))
    }
  }

  /** Per-doc token Shannon entropy, exact scaled-int (the NB lnMicros
    * convention: ln is applied to FEW distinct small-int counts and
    * rounded to micros once per value, all combination is exact Long
    * arithmetic, so `H·1e6 = lnMicros(n) − (Σ c·lnMicros(c)) DIV n`
    * replays bit-for-bit). Low entropy = repetitive/templated text — the
    * standard corpus-quality filter beside q64's Gopher repetition rules.
    * One (doc, term) aggregate with map-side combine; docs with zero
    * tokens are excluded (entropy undefined).
    */
  val q186TokenEntropy: Q = Q(
    "q186_token_entropy",
    s"""WITH t AS (SELECT doc_id, unnest($DuckToks) AS term FROM documents),
       |c AS (SELECT doc_id, term, count(*) AS c FROM t GROUP BY 1, 2),
       |d AS (
       |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_toks,
       |    CAST(count(*) AS BIGINT) AS n_types,
       |    CAST(SUM(c * CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000 + 0.5)
       |      AS BIGINT)) AS BIGINT) AS s
       |  FROM c GROUP BY 1
       |)
       |SELECT doc_id, n_toks, n_types,
       |  CAST(floor(ln(CAST(n_toks AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
       |    - (s // n_toks) AS entropy_e6
       |FROM d ORDER BY doc_id""".stripMargin) { (s, dir) =>
    def lnM(c: org.apache.spark.sql.Column) =
      floor(log(c.cast("double")) * 1000000 + 0.5).cast("long")
    Tables.documentsSpread(s, dir)
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_toks"), count(lit(1)).as("n_types"),
        sum(col("c") * lnM(col("c"))).as("s"))
      .select(col("doc_id"), col("n_toks"), col("n_types"),
        (lnM(col("n_toks")) - expr("s DIV n_toks")).as("entropy_e6"))
      .orderBy("doc_id")
  }

  /** Per-doc bigram diversity (distinct/total adjacent bigrams) — the
    * n-gram repetition signal ratioed the other way from q64's
    * top-bigram fraction. Shape matters: BOTH counts are per-row array
    * ops (size + array_distinct), so the whole gate is an embarrassingly
    * parallel map stage — zero shuffles, no exploded corpus. Docs with
    * fewer than 2 tokens have no bigram positions and are excluded.
    *
    * The interpreted bigram expression sits behind a materialization
    * barrier: three consumers (the filter + both sizes) would otherwise
    * each re-inline it via CollapseProject (no CSE in interpreted eval —
    * the repo-wide rule; unbarriered this gate ran 10 s at sf0.1, 0.5 s
    * with the pin, released via sealOutput).
    */
  val q187BigramDiversity: Q = Q(
    "q187_bigram_diversity",
    s"""WITH t AS (SELECT doc_id, $DuckToks AS l FROM documents),
       |b AS (
       |  SELECT doc_id,
       |    list_transform(list_zip(l[1:-2], l[2:-1]),
       |      x -> x[1] || ' ' || x[2]) AS bigs
       |  FROM t WHERE len(l) >= 2
       |)
       |SELECT doc_id, CAST(len(bigs) AS BIGINT) AS n_bigrams,
       |  CAST(len(list_distinct(bigs)) AS BIGINT) AS n_distinct,
       |  ${graft.functions.Exact.roundPortableSql(
             "CAST(len(list_distinct(bigs)) AS DOUBLE) / CAST(len(bigs) AS DOUBLE)", 6)}
       |    AS diversity
       |FROM b ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val base = Tables.documentsSpread(s, dir)
      .select(col("doc_id"),
        TextAnalysis.bigrams(TextAnalysis.tokens(col("text"))).as("bigs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.ops.Pins.sealOutput(
      base.where(size(col("bigs")) >= 1)
        .select(col("doc_id"), size(col("bigs")).cast("long").as("n_bigrams"),
          size(array_distinct(col("bigs"))).cast("long").as("n_distinct"))
        .withColumn("diversity", graft.functions.Exact.roundPortable(
          col("n_distinct").cast("double") / col("n_bigrams").cast("double"), 6))
        .orderBy("doc_id"),
      base)
  }

  /** Phrase search via a POSITIONAL inverted index: per-doc occurrence
    * counts of exact adjacent-word phrases, found by joining the (doc,
    * pos, term) posting table against itself at pos+1 — the scalable
    * multi-word phrase-query plan (an n-word phrase chains n−1 position
    * joins; the postings shuffle once on the term key and only matching
    * positions move). The phrase list spans each SF's corpus so the gate
    * always has matches; the oracle counts the same phrases in the
    * adjacent-bigram list.
    */
  val q195PhraseSearch: Q = {
    val phrases = Seq("stream data", "table hash", "order fast")
    val phraseList = phrases.map(p => s"'$p'").mkString("[", ", ", "]")
    Q(
      "q195_phrase_search",
      s"""WITH t AS (SELECT doc_id, $DuckToks AS l FROM documents),
         |b AS (
         |  SELECT doc_id, list_transform(list_zip(l[1:-2], l[2:-1]),
         |    x -> x[1] || ' ' || x[2]) AS bigs
         |  FROM t
         |), p AS (SELECT unnest($phraseList) AS phrase)
         |SELECT p.phrase, b.doc_id,
         |  CAST(len(list_filter(b.bigs, x -> x = p.phrase)) AS BIGINT)
         |    AS n_occ
         |FROM b CROSS JOIN p
         |WHERE len(list_filter(b.bigs, x -> x = p.phrase)) > 0
         |ORDER BY phrase, doc_id""".stripMargin) { (s, dir) =>
      val pp = phrases.map { p =>
        val Array(a, b) = p.split(" "); (p, a, b)
      }
      import s.implicits._
      val ppDf = pp.toDF("phrase", "w1", "w2")
      // postings shared by both sides of the position join — barrier, then
      // released by sealOutput (no-CSE rule for the tokenize+posexplode)
      val pos = Tables.documentsSpread(s, dir)
        .select(col("doc_id"),
          posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "term")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.ops.Pins.sealOutput(
        pos.join(broadcast(ppDf), col("term") === col("w1"))
          .join(pos.select(col("doc_id"), (col("pos") - 1).as("pos"),
            col("term").as("_t2")), Seq("doc_id", "pos"))
          .where(col("_t2") === col("w2"))
          .groupBy("phrase", "doc_id")
          .agg(count(lit(1)).as("n_occ"))
          .orderBy("phrase", "doc_id"),
        pos)
    }
  }

  /** Char-mass-weighted median document length per language: the smallest
    * length v such that docs of length ≤ v hold at least half the
    * language's characters — the "where does the corpus mass sit" signal
    * behind packing and length-bucket budgeting (a plain median is
    * dominated by short docs; the mass median is not). Exact integer
    * cumulative-weight rule 2·cum ≥ total; the engine windows over the
    * (lang, length)-DISTINCT table, never the corpus
    * (Quantiles.weightedMedian scaladoc).
    */
  val q215WeightedMedian: Q = Q(
    "q215_weighted_median",
    """WITH vw AS (
      |  SELECT lang, n_chars AS v, sum(n_chars) AS wv
      |  FROM documents GROUP BY lang, n_chars
      |), c AS (
      |  SELECT lang, v,
      |    sum(wv) OVER (PARTITION BY lang ORDER BY v) AS cum,
      |    sum(wv) OVER (PARTITION BY lang) AS tot
      |  FROM vw)
      |SELECT lang, CAST(min(tot) AS BIGINT) AS w_total,
      |  CAST(min(v) AS BIGINT) AS wmedian
      |FROM c WHERE tot > 0 AND cum * 2 >= tot
      |GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    graft.ops.Quantiles.weightedMedian(
        Tables.documents(s, dir), "lang", "n_chars", "n_chars")
      .orderBy("lang")
  }

  val all: Seq[Q] = Seq(q20TextStats, q21TokenClasses, q22LangId,
    q23QualityScore, q24DocFingerprint, q50TfIdfTopTerms, q52HeavyHitters,
    q61CountMinEstimates, q62Boilerplate, q63SequencePacking,
    q103SparseCosine, q109Blocklist, q128HtmlExtract, q129NfcNormalize,
    q164Augment, q165Kappa, q186TokenEntropy, q187BigramDiversity,
    q195PhraseSearch, q215WeightedMedian)
}
