package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextAnalysis
import graft.ops.Dedup

/** Deduplication operators over `documents`: exact, blocked n-gram Jaccard,
  * MinHash+LSH, SimHash. The portable (md5) hash flavor is used here so
  * every pipeline stage is oracle-checkable end to end; the engine also
  * ships the xxhash64 fast flavor for production runs.
  */
object DedupQueries {

  private val DuckToks = "list_filter(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' '), t -> len(t) > 0)"
  /** DuckDB 60-bit portable hash of expression `e` under `seed`. */
  private def duckHash(seed: String, e: String): String =
    s"CAST(('0x' || substring(md5('$seed' || ':' || $e), 1, 15)) AS BIGINT)"

  /** Exact dedup by content hash: every doc with its fingerprint group. */
  val q25ExactDedup: Q = Q(
    "q25_exact_dedup",
    """SELECT doc_id, fp, group_size, is_keeper FROM (
      |  SELECT doc_id, fp,
      |    count(*) OVER (PARTITION BY fp) AS group_size,
      |    (doc_id = min(doc_id) OVER (PARTITION BY fp)) AS is_keeper
      |  FROM (SELECT doc_id, md5(text) AS fp FROM documents)
      |)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Dedup.exactDedup(Tables.documentsSpread(s, dir), "text", "doc_id")
      .select("doc_id", "fp", "group_size", "is_keeper")
      .orderBy("doc_id")
  }

  /** Blocked near-dup: token-set Jaccard ≥ 0.6 among docs sharing an
    * n_chars bucket (64-char bins bound the pairwise term).
    */
  val q26JaccardNearDup: Q = Q(
    "q26_jaccard_neardup",
    s"""SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(floor((CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
       |        / len(list_distinct(a.toks || b.toks))) * 1000000 + 0.5) AS BIGINT) / CAST(1000000 AS DOUBLE) AS jac
       |FROM (SELECT doc_id, n_chars // 64 AS blk, list_distinct($DuckToks) AS toks FROM documents) a
       |JOIN (SELECT doc_id, n_chars // 64 AS blk, list_distinct($DuckToks) AS toks FROM documents) b
       |  ON a.blk = b.blk AND a.doc_id < b.doc_id
       |WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
       |      / len(list_distinct(a.toks || b.toks)) >= 0.6
       |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
      .withColumn("_toks", array_distinct(TextAnalysis.tokens(col("text"))))
    // subBlocks = 0: auto-split hot blocks (result-invariant; s = 1 at
    // this corpus's block sizes, engages at the 10x-probe scale)
    Dedup.jaccardPairs(docs, "doc_id", "_toks", expr("n_chars DIV 64"), 0.6,
      subBlocks = 0)
      .withColumn("jac", graft.functions.Exact.roundPortable(col("jac"), 6))
      .orderBy("id_a", "id_b")
  }

  /** Containment near-dup (one-directional Jaccard): |A∩B|/min(|A|,|B|)
    * ≥ 0.9 within (lang, first-token) blocks — catches excerpt/superset
    * relations symmetric Jaccard misses.
    */
  val q75Containment: Q = Q(
    "q75_containment",
    s"""WITH t AS (
       |  SELECT doc_id, lang, list_sort(list_distinct($DuckToks)) AS toks,
       |    ($DuckToks)[1] AS tok1
       |  FROM documents
       |)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(floor((CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
       |        / least(len(a.toks), len(b.toks))) * 1000000 + 0.5) AS BIGINT) / CAST(1000000 AS DOUBLE) AS containment
       |FROM t a JOIN t b
       |  ON a.lang = b.lang AND a.tok1 = b.tok1 AND a.doc_id < b.doc_id
       |WHERE least(len(a.toks), len(b.toks)) > 0
       |  AND CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
       |      / least(len(a.toks), len(b.toks)) >= 0.9
       |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
      .withColumn("_toks", array_distinct(TextAnalysis.tokens(col("text"))))
      // size guard: a token-less doc (punctuation-only text) has [] and
      // element_at([], 1) raises under ANSI (round-13 array-index audit).
      // NULL _tok1 is harmless either way: such docs carry _toks=[] and
      // containmentPairs' least(_na,_nb)>0 filter drops their pairs.
      .withColumn("_tok1", when(size(TextAnalysis.tokens(col("text"))) >= 1,
        element_at(TextAnalysis.tokens(col("text")), 1)))
    Dedup.containmentPairs(docs, "doc_id", "_toks",
        concat_ws("|", col("lang"), col("_tok1")), 0.9)
      .withColumn("containment", graft.functions.Exact.roundPortable(col("containment"), 6))
      .orderBy("id_a", "id_b")
  }

  /** MinHash(12) + LSH(4 bands × 3 rows) candidate generation over word
    * 2-gram shingles, verified with exact Jaccard ≥ 0.5.
    */
  val q27MinhashLsh: Q = {
    val bands = 4; val rows = 3; val seed = "mh"
    Q(
      "q27_minhash_lsh",
      s"""WITH docs AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(
         |      generate_series(1, greatest(len(toks) - 1, 0)),
         |      i -> array_to_string(toks[i:i+1], ' '))) AS sh
         |  FROM (SELECT doc_id, $DuckToks AS toks FROM documents)
         |), sigs AS (
         |  SELECT doc_id, sh,
         |    list_transform(generate_series(0, ${bands * rows - 1}),
         |      h -> list_min(list_transform(sh,
         |        s -> CAST(('0x' || substring(md5('$seed:' || CAST(h AS VARCHAR) || ':' || s), 1, 15)) AS BIGINT)))) AS sig
         |  FROM docs WHERE len(sh) > 0
         |), bands AS (
         |  SELECT doc_id, sh, b,
         |    md5(array_to_string(sig[b*$rows+1 : b*$rows+$rows], ',')) AS bucket
         |  FROM sigs, generate_series(0, ${bands - 1}) t(b)
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |    a.sh AS sh_a, b.sh AS sh_b
         |  FROM bands a JOIN bands b ON a.b = b.b AND a.bucket = b.bucket
         |    AND a.doc_id < b.doc_id
         |)
         |SELECT id_a, id_b,
         |  CAST(floor((CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
         |        / len(list_distinct(sh_a || sh_b))) * 1000000 + 0.5) AS BIGINT) / CAST(1000000 AS DOUBLE) AS jac
         |FROM cand
         |WHERE CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
         |      / len(list_distinct(sh_a || sh_b)) >= 0.5
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
        .withColumn("_sh", graft.functions.WordShinglesExpr(col("text"), 2))
      Dedup.minhashLshPairs(docs, "doc_id", "_sh", bands, rows, seed, 0.5, portable = true)
        .withColumn("jac", graft.functions.Exact.roundPortable(col("jac"), 6))
        .orderBy("id_a", "id_b")
    }
  }

  /** 16-bit SimHash per document + near-dup pairs at Hamming ≤ 3 within
    * the n_chars block.
    */
  val q28Simhash: Q = Q(
    "q28_simhash",
    s"""WITH sigs AS (
       |  SELECT doc_id, n_chars // 64 AS blk,
       |    list_sum(list_transform(generate_series(0, 15),
       |      b -> CASE WHEN list_sum(list_transform(toks,
       |             t -> CASE WHEN ((${duckHash("sh", "t")} >> b) & 1) = 1 THEN 1 ELSE -1 END)) > 0
       |           THEN CAST(power(2, b) AS BIGINT) ELSE 0 END)) AS simhash
       |  FROM (SELECT doc_id, n_chars, $DuckToks AS toks FROM documents)
       |)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  bit_count(xor(a.simhash, b.simhash)) AS hamming
       |FROM sigs a JOIN sigs b ON a.blk = b.blk AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    // one-pass native simhash kernel: the token hashes feed a single
    // expression, so no materialization barrier is needed between hashing
    // and the bit fold; the persist below still splits the join branches
    val docs = Tables.documentsSpread(s, dir)
      .select(col("doc_id"), expr("n_chars DIV 64").as("_blk"),
        Dedup.simhashFromHashes(
          transform(TextAnalysis.tokens(col("text")),
            t => Dedup.hash60(t, "sh", portable = true)), 16).as("_simhash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = docs.select(col("_blk"), col("doc_id").as("id_a"), col("_simhash").as("sh_a"))
    val b = docs.select(col("_blk"), col("doc_id").as("id_b"), col("_simhash").as("sh_b"))
    graft.ops.Pins.sealOutput(
      a.join(b, Seq("_blk"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("hamming", Dedup.hamming(col("sh_a"), col("sh_b")))
        .filter(col("hamming") <= 3)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b"),
      docs)
  }

  /** Banded SimHash Hamming join (Manku WWW'07 pigeonhole blocking): the
    * 16-bit signature splits into 4 bands of 4 bits; Hamming≤3 pairs must
    * agree exactly on ≥1 band, so candidates come from a (band, value)
    * equi-join with recall 1.0 by construction — no length-blocking
    * assumption like q28. The oracle replays the banding, the distinct
    * candidate set, and the Hamming verify.
    */
  val q112SimhashBands: Q = Q(
    "q112_simhash_bands",
    s"""WITH sigs AS (
       |  SELECT doc_id,
       |    list_sum(list_transform(generate_series(0, 15),
       |      b -> CASE WHEN list_sum(list_transform(toks,
       |             t -> CASE WHEN ((${duckHash("sh", "t")} >> b) & 1) = 1 THEN 1 ELSE -1 END)) > 0
       |           THEN CAST(power(2, b) AS BIGINT) ELSE 0 END)) AS simhash
       |  FROM (SELECT doc_id, $DuckToks AS toks FROM documents)
       |), keys AS (
       |  SELECT doc_id, simhash, band, (simhash >> (band * 4)) & 15 AS bval
       |  FROM sigs CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band)
       |)
       |SELECT id_a, id_b, hamming FROM (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |    bit_count(xor(a.simhash, b.simhash)) AS hamming
       |  FROM keys a JOIN keys b
       |    ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
       |)
       |WHERE hamming <= 3
       |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    val sigs = Tables.documentsSpread(s, dir)
      .select(col("doc_id"),
        Dedup.simhash(TextAnalysis.tokens(col("text")), 16, "sh").as("simhash"))
    Dedup.simhashHammingPairs(sigs, "doc_id", "simhash", 16, 3)
      .orderBy("id_a", "id_b")
  }

  /** Salted skew join gate: documents (5-language Zipfian key — every row
    * of a language lands on one reducer unsalted) joined to per-language
    * counts through SkewJoin. The salted plan must produce EXACTLY the
    * plain-join result, which the oracle states as a window count.
    */
  val q40SaltedSkewJoin: Q = Q(
    "q40_salted_skew_join",
    """SELECT doc_id, lang, count(*) OVER (PARTITION BY lang) AS lang_n
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documentsSpread(s, dir)
    val perLang = docs.groupBy("lang").agg(count(lit(1)).as("lang_n"))
    graft.ops.SkewJoin.saltedJoin(docs, perLang, "lang", col("doc_id"), salts = 8)
      .select("doc_id", "lang", "lang_n")
      .orderBy("doc_id")
  }

  /** Rollup subtotals (extension surface — the reference has no grouping
    * sets): per-(lang, size-bucket) counts with per-lang and grand
    * totals in one pass. Spark plans this as ONE Expand + aggregation —
    * the distributable form of subtotal reporting (no per-level
    * re-scans). Subtotal rows carry NULL group keys; `lang` is non-null
    * in the corpus, so ordering NULLS FIRST on both engines makes the
    * output total-ordered and hashable.
    */
  val q42RollupCensus: Q = Q(
    "q42_rollup_census",
    """SELECT lang, n_chars // 256 AS bucket, count(*) AS n,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents
      |GROUP BY ROLLUP(lang, n_chars // 256)
      |ORDER BY lang NULLS FIRST, bucket NULLS FIRST""".stripMargin) { (s, dir) =>
    Tables.documentsSpread(s, dir)
      .rollup(col("lang"), expr("n_chars DIV 256").as("bucket"))
      .agg(count(lit(1)).as("n"), sum("n_chars").as("sum_chars"))
      .orderBy(col("lang").asc_nulls_first, col("bucket").asc_nulls_first)
  }

  /** Cube twin of q42: all four grouping levels — (lang, bucket) cells,
    * per-lang, per-bucket, grand total — still ONE Expand+agg pass.
    * The bucket-only subtotal level is what rollup cannot produce.
    */
  val q47CubeCensus: Q = Q(
    "q47_cube_census",
    """SELECT lang, n_chars // 256 AS bucket, count(*) AS n,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents
      |GROUP BY CUBE(lang, n_chars // 256)
      |ORDER BY lang NULLS FIRST, bucket NULLS FIRST""".stripMargin) { (s, dir) =>
    Tables.documentsSpread(s, dir)
      .cube(col("lang"), expr("n_chars DIV 256").as("bucket"))
      .agg(count(lit(1)).as("n"), sum("n_chars").as("sum_chars"))
      .orderBy(col("lang").asc_nulls_first, col("bucket").asc_nulls_first)
  }

  /** INTERSECT set op (U-family completion next to q09 except / q10
    * union): doc ids that are BOTH English AND above-median length —
    * Spark plans `intersect` as a left-semi aggregate join, one shuffle.
    */
  val q48IntersectDocs: Q = Q(
    "q48_intersect_docs",
    """SELECT doc_id FROM documents WHERE lang = 'en'
      |INTERSECT
      |SELECT doc_id FROM documents WHERE n_chars > 300
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documentsSpread(s, dir)
    docs.filter(col("lang") === "en").select("doc_id")
      .intersect(docs.filter(col("n_chars") > 300).select("doc_id"))
      .orderBy("doc_id")
  }

  /** Dedup clustering: the q26 near-dup pair set closed into connected
    * components (near-dup relations CHAIN: A~B, B~C puts A and C in one
    * duplicate group even when A~C is below threshold), every document
    * labeled with its cluster (= min member id), cluster size, and the
    * keep-one-per-cluster `is_canonical` flag. Spark side: the alternating
    * large-star/small-star closure (O(log n) rounds, edge set collapses as
    * components contract; `Cluster.labelPropagation` is the parity-tested
    * O(diameter) twin). Oracle: recursive-CTE transitive closure — each step
    * only propagates labels smaller than the receiving node, which prunes
    * the closure without losing the minimum.
    */
  val q49DedupClusters: Q = Q(
    "q49_dedup_clusters",
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
       |)
       |SELECT doc_id, cluster_id,
       |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       |  (doc_id = cluster_id) AS is_canonical
       |FROM lab
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
      .withColumn("_toks", array_distinct(TextAnalysis.tokens(col("text"))))
    val pairs = graft.ops.Dedup.jaccardPairs(docs, "doc_id", "_toks",
      expr("n_chars DIV 64"), 0.6, subBlocks = 0)
    graft.ops.Cluster.clusters(
      Tables.documents(s, dir).select("doc_id"), "doc_id",
      pairs, "id_a", "id_b")
      .orderBy("doc_id")
  }

  /** Cross-corpus keep-first passage dedup (RefinedWeb-style exact
    * substring dedup at 16-token granularity): of all copies of a
    * passage only the lowest-(doc, position) one survives; docs rebuilt
    * from survivors. The oracle states the same keep-first window.
    */
  val q101PassageDedup: Q = {
    val width = 16
    Q(
      "q101_passage_dedup",
      s"""WITH t AS (
         |  SELECT doc_id, toks, (len(toks) + ${width - 1}) // $width AS nc
         |  FROM (SELECT doc_id, $DuckToks AS toks FROM documents)
         |  WHERE len(toks) > 0
         |), segs AS (
         |  SELECT doc_id, i AS seg_idx,
         |    array_to_string(toks[i*$width+1 : i*$width+$width], ' ') AS seg
         |  FROM (SELECT doc_id, toks, unnest(generate_series(0, nc - 1)) AS i FROM t)
         |), marked AS (
         |  SELECT doc_id, seg_idx, seg,
         |    row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
         |  FROM segs
         |)
         |SELECT doc_id,
         |  count(*) AS n_segments,
         |  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         |  nullif(string_agg(CASE WHEN rn = 1 THEN seg END, ' ' ORDER BY seg_idx), '') AS clean_text
         |FROM marked
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.ops.Boilerplate.dedupPassagesKeepFirst(
        Tables.documentsSpread(s, dir), "doc_id",
        TextAnalysis.tokens(col("text")), width)
        .orderBy("doc_id")
    }
  }

  /** Approximation-quality harness for the LSH dedup path (the q70-recall
    * pattern applied to MinHash): shingle-Jaccard ≥ 0.5 pairs found by
    * direct length-blocked comparison (the reference set) vs by
    * MinHash(12)+LSH(4×3) banding, and the band recall — all as scalar
    * columns the oracle recomputes exactly. Both engines mirror both
    * pipelines, so the gate proves the LSH decomposition loses exactly
    * the pairs the band math says it may lose, on every run.
    */
  val q102LshRecall: Q = {
    val bands = 4; val rows = 3; val seed = "mh"; val thr = 0.5
    Q(
      "q102_lsh_recall",
      s"""WITH sh AS (
         |  SELECT doc_id, n_chars // 32 AS blk,
         |    list_distinct(list_transform(
         |      generate_series(1, greatest(len(toks) - 1, 0)),
         |      i -> array_to_string(toks[i:i+1], ' '))) AS sh
         |  FROM (SELECT doc_id, n_chars, $DuckToks AS toks FROM documents)
         |), shn AS (
         |  SELECT * FROM sh WHERE len(sh) > 0
         |), ref AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM shn a JOIN shn b ON a.blk = b.blk AND a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |        / len(list_distinct(a.sh || b.sh)) >= $thr
         |), sigs AS (
         |  SELECT doc_id, sh,
         |    list_transform(generate_series(0, ${bands * rows - 1}),
         |      h -> list_min(list_transform(sh,
         |        s -> CAST(('0x' || substring(md5('$seed:' || CAST(h AS VARCHAR) || ':' || s), 1, 15)) AS BIGINT)))) AS sig
         |  FROM shn
         |), bnd AS (
         |  SELECT doc_id, sh, b,
         |    md5(array_to_string(sig[b*$rows+1 : b*$rows+$rows], ',')) AS bucket
         |  FROM sigs, generate_series(0, ${bands - 1}) t(b)
         |), lsh AS (
         |  SELECT id_a, id_b FROM (
         |    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |      a.sh AS sh_a, b.sh AS sh_b
         |    FROM bnd a JOIN bnd b ON a.b = b.b AND a.bucket = b.bucket
         |      AND a.doc_id < b.doc_id
         |  )
         |  WHERE CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
         |        / len(list_distinct(sh_a || sh_b)) >= $thr
         |), com AS (
         |  SELECT * FROM ref INTERSECT SELECT * FROM lsh
         |)
         |SELECT
         |  (SELECT count(*) FROM ref) AS n_ref,
         |  (SELECT count(*) FROM lsh) AS n_lsh,
         |  (SELECT count(*) FROM com) AS n_common,
         |  CASE WHEN (SELECT count(*) FROM ref) > 0
         |    THEN CAST(floor(CAST((SELECT count(*) FROM com) AS DOUBLE)
         |         / (SELECT count(*) FROM ref) * 1000000 + 0.5) AS BIGINT) / CAST(1000000 AS DOUBLE)
         |    ELSE CAST(1.0 AS DOUBLE) END AS recall""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
        .withColumn("_sh", graft.functions.WordShinglesExpr(col("text"), 2))
        .filter(size(col("_sh")) > 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // DIV 32 reference blocks (was 64): the regenerated corpus
      // concentrates n_chars into ~650-row DIV-64 blocks, quadrupling the
      // reference's verify pairs for a 7% gain in reference coverage —
      // the recall harness needs a sound reference pair set, not the
      // widest one, and BOTH engines mirror whatever width is chosen
      val ref = Dedup.jaccardPairs(docs, "doc_id", "_sh",
          expr("n_chars DIV 32"), thr, subBlocks = 0)
        .select("id_a", "id_b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val lsh = Dedup.minhashLshPairs(docs, "doc_id", "_sh", bands, rows,
          seed, thr, portable = true)
        .select("id_a", "id_b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val common = ref.join(lsh, Seq("id_a", "id_b"), "left_semi")
      graft.ops.Pins.sealOutput(
        ref.agg(count(lit(1)).as("n_ref"))
          .crossJoin(lsh.agg(count(lit(1)).as("n_lsh")))
          .crossJoin(common.agg(count(lit(1)).as("n_common")))
          .withColumn("recall",
            when(col("n_ref") > 0, graft.functions.Exact.roundPortable(
              col("n_common").cast("double") / col("n_ref").cast("double"), 6))
              .otherwise(lit(1.0))),
        docs, ref, lsh)
    }
  }

  /** Split-contamination audit: q27's verified near-dup pairs whose
    * members hash into DIFFERENT train/val/test splits — the train→test
    * leakage an evaluation must not have. Composes F6 split assignment
    * with the LSH dedup path; the oracle mirrors both.
    */
  val q105SplitLeakage: Q = {
    val bands = 4; val rows = 3; val lshSeed = "mh"; val thr = 0.5
    val splitSeed = "sp1"
    val jacRaw = "CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE) / len(list_distinct(sh_a || sh_b))"
    Q(
      "q105_split_leakage",
      s"""WITH docs AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(
         |      generate_series(1, greatest(len(toks) - 1, 0)),
         |      i -> array_to_string(toks[i:i+1], ' '))) AS sh
         |  FROM (SELECT doc_id, $DuckToks AS toks FROM documents)
         |), sigs AS (
         |  SELECT doc_id, sh,
         |    list_transform(generate_series(0, ${bands * rows - 1}),
         |      h -> list_min(list_transform(sh,
         |        s -> CAST(('0x' || substring(md5('$lshSeed:' || CAST(h AS VARCHAR) || ':' || s), 1, 15)) AS BIGINT)))) AS sig
         |  FROM docs WHERE len(sh) > 0
         |), bnd AS (
         |  SELECT doc_id, sh, b,
         |    md5(array_to_string(sig[b*$rows+1 : b*$rows+$rows], ',')) AS bucket
         |  FROM sigs, generate_series(0, ${bands - 1}) t(b)
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |    a.sh AS sh_a, b.sh AS sh_b
         |  FROM bnd a JOIN bnd b ON a.b = b.b AND a.bucket = b.bucket
         |    AND a.doc_id < b.doc_id
         |), pr AS (
         |  SELECT id_a, id_b,
         |    CAST(floor(($jacRaw) * 1000000 + 0.5) AS BIGINT) / CAST(1000000 AS DOUBLE) AS jac
         |  FROM cand WHERE $jacRaw >= $thr
         |), sp AS (
         |  SELECT doc_id,
         |    CASE WHEN h < 0.8 THEN 'train' WHEN h < 0.9 THEN 'val' ELSE 'test' END AS split
         |  FROM (
         |    SELECT doc_id,
         |      CAST(CAST(('0x' || substring(md5('$splitSeed:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS DOUBLE) / 1152921504606846976.0 AS h
         |    FROM documents
         |  )
         |)
         |SELECT id_a, id_b, sa.split AS split_a, sb.split AS split_b, jac
         |FROM pr
         |JOIN sp sa ON sa.doc_id = id_a
         |JOIN sp sb ON sb.doc_id = id_b
         |WHERE sa.split <> sb.split
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      graft.ops.Curation.splitLeakage(Tables.documents(s, dir), "doc_id",
        graft.functions.WordShinglesExpr(col("text"), 2),
        splitSeed, 0.8, 0.1, bands, rows, lshSeed, thr)
        .withColumn("jac", graft.functions.Exact.roundPortable(col("jac"), 6))
        .orderBy("id_a", "id_b")
    }
  }

  /** Duplicate-spam LSH dedup — the hot-bucket guard's ENGAGED path made
    * driver-checkable (round-7 verdict #1: viral duplicates put t²/2
    * candidate pairs through one band-bucket join key; the per-bucket
    * replicated-triangular sub-chunking in Dedup.chunkedSelfJoinSides must
    * spread that work WITHOUT changing the result set). The corpus is the
    * first 200 documents plus 600 copies of doc 7's text under fresh ids —
    * every spam band bucket holds 601 rows, over the 512-row pair budget,
    * so the guard provably engages at sf0.01. The oracle replays the full
    * q27 MinHash pipeline over the same spam-augmented corpus; output is
    * the per-source pair aggregate (a per-pair error anywhere shifts some
    * id_a's count or jac sum).
    */
  val q141LshHotBucket: Q = {
    val bands = 4; val rows = 3; val seed = "mh"
    val jacRaw = "CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE) / len(list_distinct(sh_a || sh_b))"
    Q(
      "q141_lsh_hot_bucket",
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id < 200
         |  UNION ALL
         |  SELECT 1000000 + g AS doc_id,
         |    (SELECT text FROM documents WHERE doc_id = 7) AS text
         |  FROM generate_series(0, 599) t(g)
         |), docs AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(
         |      generate_series(1, greatest(len(toks) - 1, 0)),
         |      i -> array_to_string(toks[i:i+1], ' '))) AS sh
         |  FROM (SELECT doc_id, $DuckToks AS toks FROM corpus)
         |), sigs AS (
         |  SELECT doc_id, sh,
         |    list_transform(generate_series(0, ${bands * rows - 1}),
         |      h -> list_min(list_transform(sh,
         |        s -> CAST(('0x' || substring(md5('$seed:' || CAST(h AS VARCHAR) || ':' || s), 1, 15)) AS BIGINT)))) AS sig
         |  FROM docs WHERE len(sh) > 0
         |), bnd AS (
         |  SELECT doc_id, sh, b,
         |    md5(array_to_string(sig[b*$rows+1 : b*$rows+$rows], ',')) AS bucket
         |  FROM sigs, generate_series(0, ${bands - 1}) t(b)
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |    a.sh AS sh_a, b.sh AS sh_b
         |  FROM bnd a JOIN bnd b ON a.b = b.b AND a.bucket = b.bucket
         |    AND a.doc_id < b.doc_id
         |), pr AS (
         |  SELECT id_a, CAST(floor(($jacRaw) * 1000000 + 0.5) AS BIGINT) AS jac_e6
         |  FROM cand WHERE $jacRaw >= 0.5
         |)
         |SELECT id_a, count(*) AS n_pairs, CAST(sum(jac_e6) AS BIGINT) AS sum_jac_e6
         |FROM pr GROUP BY id_a ORDER BY id_a""".stripMargin) { (s, dir) =>
      val base = Tables.documents(s, dir)
        .filter(col("doc_id") < 200).select("doc_id", "text")
      val spamText = base.filter(col("doc_id") === 7)
        .select(col("text").as("spam_text")) // 1-row broadcast scalar
      val spam = s.range(600).select((col("id") + 1000000L).as("doc_id"))
        .crossJoin(broadcast(spamText))
        .select(col("doc_id"), col("spam_text").as("text"))
      val corpus = base.unionByName(spam)
        .withColumn("_sh", graft.functions.WordShinglesExpr(col("text"), 2))
      Dedup.minhashLshPairs(corpus, "doc_id", "_sh", bands, rows, seed, 0.5,
          portable = true)
        .groupBy("id_a")
        .agg(count(lit(1)).as("n_pairs"),
          sum(floor(col("jac") * 1000000 + 0.5)).cast("long").as("sum_jac_e6"))
        .orderBy("id_a")
    }
  }

  /** L-bounded word suffix array + adjacent-LCP repeat profile (Lee et al.
    * ACL'22 exact-substring dedup signal): per doc, the LONGEST span
    * (chars, capped at 64) starting at one of its word boundaries that
    * recurs verbatim anywhere in the corpus, plus the count of word
    * positions whose repeat ≥ 32 chars. The oracle rebuilds the suffix
    * array with a plain ORDER BY and replays the first-mismatch LCP as a
    * correlated min-scan.
    */
  val q152SuffixRepeats: Q = {
    val (maxLen, dupLen) = (64, 32)
    Q(
      "q152_suffix_repeats",
      s"""WITH sfx AS (
         |  SELECT doc_id, i AS off, substring(text, CAST(i AS INT), $maxLen) AS w
         |  FROM documents,
         |    LATERAL (SELECT unnest(generate_series(1, len(text))) AS i) t
         |  WHERE substring(text, CAST(i AS INT), 1) != ' '
         |    AND (i = 1 OR substring(text, CAST(i AS INT) - 1, 1) = ' ')
         |), sa AS (
         |  SELECT doc_id, off, w,
         |    row_number() OVER (ORDER BY w, doc_id, off) AS rank
         |  FROM sfx
         |), pairs AS (
         |  SELECT a.rank AS r,
         |    coalesce(
         |      (SELECT min(t.i) - 1
         |       FROM (SELECT unnest(generate_series(1, least(len(a.w), len(b.w)))) AS i) t
         |       WHERE substring(a.w, CAST(t.i AS INT), 1) != substring(b.w, CAST(t.i AS INT), 1)),
         |      least(len(a.w), len(b.w))) AS lcp
         |  FROM sa a JOIN sa b ON b.rank = a.rank + 1
         |), rep AS (
         |  SELECT sa.doc_id,
         |    greatest(coalesce(p1.lcp, 0), coalesce(p2.lcp, 0)) AS rep_len
         |  FROM sa
         |  LEFT JOIN pairs p1 ON p1.r = sa.rank - 1
         |  LEFT JOIN pairs p2 ON p2.r = sa.rank
         |)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_suffixes,
         |  CAST(max(rep_len) AS BIGINT) AS max_rep_len,
         |  CAST(SUM(CASE WHEN rep_len >= $dupLen THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
         |FROM rep GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.ops.SuffixArray.repeatProfile(
          Tables.documentsSpread(s, dir), "doc_id", "text", maxLen, dupLen)
        .orderBy("doc_id")
    }
  }

  /** Sorted-neighborhood ER blocking (Hernández–Stolfo): records sorted by
    * a fuzzy key (first 3 tokens of the sorted token set — shuffle-robust
    * for bag-of-words near-dups), candidates limited to a window of 8 in
    * sort order, verified by exact token-set Jaccard ≥ 0.5. Candidate count
    * is O(n·w) even when every record shares one key — the skew case where
    * hash blocking goes quadratic.
    */
  val q156SortedNeighborhood: Q = {
    val (w, t) = (8, 0.5)
    Q(
      "q156_sorted_neighborhood",
      s"""WITH d AS (
         |  SELECT doc_id, list_distinct($DuckToks) AS toks FROM documents
         |), k AS (
         |  SELECT doc_id, toks,
         |    array_to_string(list_sort(toks)[1:3], ' ') AS key FROM d
         |), r AS (
         |  SELECT doc_id, toks,
         |    row_number() OVER (ORDER BY key, doc_id) AS rank FROM k
         |), cand AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.toks AS ta, b.toks AS tb
         |  FROM r a JOIN r b ON b.rank > a.rank AND b.rank - a.rank < $w
         |    AND a.doc_id <> b.doc_id
         |)
         |SELECT id_a, id_b,
         |  CAST(floor(jac * 1000000 + 0.5) AS BIGINT) AS jac_e6
         |FROM (
         |  SELECT id_a, id_b,
         |    CAST(len(list_intersect(ta, tb)) AS DOUBLE)
         |      / len(list_distinct(ta || tb)) AS jac
         |  FROM cand)
         |WHERE jac >= $t
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val toks = graft.functions.TextAnalysis.tokens(col("text"))
      graft.ops.Blocking.sortedNeighborhood(
          Tables.documentsSpread(s, dir), "doc_id",
          concat_ws(" ", slice(array_sort(array_distinct(toks)), 1, 3)),
          toks, w, t)
        .select(col("id_a"), col("id_b"),
          floor(col("jac") * 1000000 + 0.5).cast("long").as("jac_e6"))
        .orderBy("id_a", "id_b")
    }
  }

  /** Exact set-similarity join with prefix filtering (AllPairs/PPJoin):
    * ALL pairs with token Jaccard ≥ 0.6, no blocking heuristic, no recall
    * loss. The oracle is the BRUTE-FORCE all-pairs definition — so the
    * gate proves prefix-filter completeness, not merely that the engine
    * replays its own pipeline. Gated on a 1/10 doc slice: the corpus's
    * near-dup clusters make the TRUE result set Ω(cluster²) (7.1M pairs
    * corpus-wide at sf0.1 — real answers, not candidate waste), and the
    * completeness proof is slice-size-independent.
    */
  val q166PrefixJoin: Q = {
    val theta = 0.6
    Q(
      "q166_prefix_join",
      s"""WITH d AS MATERIALIZED (
         |  SELECT doc_id, list_distinct($DuckToks) AS toks FROM documents
         |  WHERE doc_id % 10 = 0
         |), p AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
         |      / len(list_distinct(a.toks || b.toks)) AS jac
         |  FROM d a JOIN d b ON a.doc_id < b.doc_id
         |  WHERE len(a.toks) > 0 AND len(b.toks) > 0
         |)
         |SELECT id_a, id_b, CAST(floor(jac * 1000000 + 0.5) AS BIGINT) AS jac_e6
         |FROM p WHERE jac >= $theta ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      graft.ops.PrefixJoin.jaccardPairs(
          Tables.documentsSpread(s, dir).where(col("doc_id") % 10 === 0),
          "doc_id", TextAnalysis.tokens(col("text")), theta)
        .select(col("id_a"), col("id_b"),
          floor(col("jac") * 1000000 + 0.5).cast("long").as("jac_e6"))
        .orderBy("id_a", "id_b")
    }
  }

  val all: Seq[Q] = Seq(q25ExactDedup, q26JaccardNearDup, q27MinhashLsh,
    q28Simhash, q40SaltedSkewJoin, q42RollupCensus, q47CubeCensus,
    q48IntersectDocs, q49DedupClusters, q75Containment, q101PassageDedup,
    q102LshRecall, q105SplitLeakage, q112SimhashBands, q141LshHotBucket,
    q152SuffixRepeats, q156SortedNeighborhood, q166PrefixJoin)
}
