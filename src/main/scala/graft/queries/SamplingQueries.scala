package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Exact, Hashing}

/** Deterministic sampling gates over `documents` (ops/Sampling): the
  * curation-pipeline counterpart of the reference's hash-based
  * train/val/test split (F4-F6) — same seeded-hash machinery, applied to
  * per-stratum corpus downsampling.
  */
object SamplingQueries {

  private val Span = "CAST(1152921504606846976 AS DOUBLE)" // 2^60
  private def duckUnit(seed: String, e: String): String =
    s"(CAST(CAST(('0x' || substring(md5('$seed:' || $e), 1, 15)) AS BIGINT) AS DOUBLE) / $Span)"

  /** Stratified deterministic sample: per-language keep fractions (en
    * downsampled hardest, the zh stratum exercising the default-fraction
    * fallback), membership a pure function of doc_id. The oracle states
    * the same md5-derived unit hash and CASE fractions.
    */
  val q51StratifiedSample: Q = {
    val fracs = Seq("de" -> 0.30, "en" -> 0.15, "es" -> 0.45, "fr" -> 0.60)
    val default = 0.5
    val caseSql = fracs.map { case (l, f) => s"WHEN '$l' THEN CAST($f AS DOUBLE)" }
      .mkString("CASE lang ", " ", s" ELSE CAST($default AS DOUBLE) END")
    Q(
      "q51_stratified_sample",
      s"""SELECT doc_id, lang,
         |  CAST(floor(h * 1000000 + 0.5) AS BIGINT) / CAST(1000000 AS DOUBLE) AS h
         |FROM (
         |  SELECT doc_id, lang, ${duckUnit("samp1", "CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents
         |)
         |WHERE h < $caseSql
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val fractions = fracs.toDF("lang", "fraction")
      graft.ops.Sampling.stratified(
        Tables.documents(s, dir).select("doc_id", "lang"),
        "lang", fractions, col("doc_id"), "samp1", default)
        .withColumn("h", graft.functions.Exact.roundPortable(
          Hashing.hashUnit(col("doc_id").cast("string"), "samp1"), 6))
        .select("doc_id", "lang", "h")
        .orderBy("doc_id")
    }
  }

  /** Priority sampling: the 20 highest-priority docs per language,
    * weighted by n_chars (priority = w/u, u the seeded unit hash). The
    * oracle states the identical IEEE multiply/divide priority — the
    * SELECTED SET is the checked contract (the raw priority magnitude can
    * exceed the exact-integer rounding range, so it stays internal; both
    * engines rank bit-identically because *, / are correctly rounded).
    */
  val q100PrioritySample: Q = {
    val (seed, k) = ("ps1", 20)
    Q(
      "q100_priority_sample",
      s"""SELECT lang, doc_id, rk FROM (
         |  SELECT lang, doc_id, row_number() OVER (
         |    PARTITION BY lang
         |    ORDER BY CAST(n_chars AS DOUBLE) * 1152921504606846976
         |              / CAST(CAST(('0x' || substring(md5('$seed:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1 AS DOUBLE) DESC,
         |      doc_id) AS rk
         |  FROM documents
         |)
         |WHERE rk <= $k
         |ORDER BY lang, rk""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions.col
      graft.ops.Sampling.prioritySample(
        Tables.documents(s, dir).select("lang", "doc_id", "n_chars"),
        col("doc_id"), col("n_chars"), seed, k, Seq("lang"))
        .select("lang", "doc_id", "rk")
        .orderBy("lang", "rk")
    }
  }

  /** Deterministic epoch shuffle: global training order = rank under the
    * seeded hash (hash asc, id tiebreak), shard = pos mod 4. The engine
    * computes the rank with the distributed two-pass PrefixSum (no
    * single-reducer global window); the oracle states the same order as a
    * plain row_number.
    */
  val q114EpochShuffle: Q = Q(
    "q114_epoch_shuffle",
    """SELECT doc_id, pos, pos % 4 AS shard FROM (
      |  SELECT doc_id,
      |    row_number() OVER (ORDER BY
      |      CAST(('0x' || substring(md5('ep1' || ':' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
      |      doc_id) - 1 AS pos
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    graft.ops.Sampling.epochShuffle(
        Tables.documents(s, dir).select("doc_id"), col("doc_id"), "ep1", 4)
      .select("doc_id", "pos", "shard")
      .orderBy("doc_id")
  }

  /** UniMax (Chung ICLR'23) token-budget allocation over languages:
    * budget 30k tokens, epoch cap 2 — small languages saturate the cap,
    * the unabsorbed budget water-fills into the larger ones. The oracle
    * replays the ascending-size recursion with a recursive CTE on the
    * same exact integers.
    */
  private val UnimaxBudget = 30000L
  private val UnimaxCap = 2
  private val UnimaxAllocSql =
    s"least($UnimaxCap * o.tokens, st.rem // (o.nl - o.i + 1))"
  private val UnimaxEpochsSql = Exact.roundPortableSql(
    s"CASE WHEN o.tokens > 0 THEN CAST($UnimaxAllocSql AS DOUBLE) / CAST(o.tokens AS DOUBLE) ELSE 0.0 END",
    6)
  /** The q125 recursion as reusable CTEs (ends needing a final SELECT). */
  private val UnimaxCtes = {
    val toks = "list_filter(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' '), t -> len(t) > 0)"
    s"""per AS (
       |  SELECT lang, CAST(SUM(len(l)) AS BIGINT) AS tokens
       |  FROM (SELECT lang, $toks AS l FROM documents) GROUP BY lang
       |), ord AS (
       |  SELECT lang, tokens,
       |    CAST(row_number() OVER (ORDER BY tokens, lang) AS BIGINT) AS i,
       |    CAST(count(*) OVER () AS BIGINT) AS nl
       |  FROM per
       |), st AS (
       |  SELECT CAST(1 AS BIGINT) AS i, CAST($UnimaxBudget AS BIGINT) AS rem
       |  UNION ALL
       |  SELECT st.i + 1, st.rem - $UnimaxAllocSql
       |  FROM st JOIN ord o ON o.i = st.i
       |)""".stripMargin
  }

  private def unimaxAllocDf(s: org.apache.spark.sql.SparkSession, dir: String) =
    graft.ops.Sampling.unimaxAlloc(
      Tables.documentsSpread(s, dir)
        .select(col("lang"), graft.functions.TextAnalysis.tokens(col("text")).as("_t")),
      "lang", size(col("_t")).cast("long"), UnimaxBudget, UnimaxCap)

  val q125Unimax: Q = Q(
    "q125_unimax_alloc",
    s"""WITH RECURSIVE $UnimaxCtes
       |SELECT o.lang AS lang, o.tokens AS tokens, $UnimaxAllocSql AS alloc,
       |  $UnimaxEpochsSql AS epochs
       |FROM ord o JOIN st ON st.i = o.i
       |ORDER BY lang""".stripMargin) { (s, dir) =>
    unimaxAllocDf(s, dir).orderBy("lang")
  }

  /** Deterministic epoch-expansion of the q125 allocation: every doc
    * appears floor(epochs) times plus one more when its seeded unit hash
    * lands under frac(epochs) — the map-only APPLY step that turns
    * per-language epoch weights into the actual repeated training view.
    */
  val q126EpochUpsample: Q = Q(
    "q126_epoch_upsample",
    s"""WITH RECURSIVE $UnimaxCtes, ep AS (
       |  SELECT o.lang AS lang, $UnimaxEpochsSql AS epochs
       |  FROM ord o JOIN st ON st.i = o.i
       |), nc AS (
       |  SELECT doc_id, d.lang AS lang,
       |    CAST(floor(epochs) AS BIGINT)
       |      + CASE WHEN ${duckUnit("up1", "CAST(doc_id AS VARCHAR)")}
       |          < epochs - floor(epochs) THEN 1 ELSE 0 END AS n
       |  FROM documents d JOIN ep ON d.lang = ep.lang
       |)
       |SELECT doc_id, lang, unnest(generate_series(1, n)) AS copy
       |FROM nc WHERE n > 0
       |ORDER BY doc_id, copy""".stripMargin) { (s, dir) =>
    val alloc = unimaxAllocDf(s, dir).select("lang", "epochs")
    graft.ops.Curation.epochUpsample(
        Tables.documents(s, dir).select(col("doc_id"), col("lang"))
          .join(broadcast(alloc), "lang"),
        "doc_id", col("epochs"), "up1")
      .select("doc_id", "lang", "copy")
      .orderBy("doc_id", "copy")
  }

  /** Exact-proportion stratified split: within each language, rank by
    * (seeded hash, doc_id) and send the first ⌊0.8·n⌋ to train — quotas
    * land exactly, unlike q07/q51's Bernoulli threshold (±O(1/√n) drift
    * per stratum). The engine ranks with the distributed two-pass
    * PrefixSum minus per-stratum first-rank offsets (no per-stratum
    * window reducer — Sampling.exactStratifiedSplit scaladoc); the oracle
    * states the same order as a plain partitioned row_number, and the
    * `rk·5 ≤ n·4` quota rule is pure integer arithmetic on both engines.
    */
  val q214ExactStratifiedSplit: Q = Q(
    "q214_exact_stratified_split",
    """WITH h AS (
      |  SELECT doc_id, lang,
      |    CAST(('0x' || substring(md5('xs1:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      |  FROM documents
      |), r AS (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk,
      |    count(*) OVER (PARTITION BY lang) AS n
      |  FROM h)
      |SELECT doc_id, lang,
      |  CASE WHEN rk * 5 <= n * 4 THEN 'train' ELSE 'test' END AS split
      |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
    graft.ops.Sampling.exactStratifiedSplit(
        Tables.documents(s, dir).select("doc_id", "lang"),
        "lang", col("doc_id"), "xs1", 4, 5)
      .select("doc_id", "lang", "split")
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(q51StratifiedSample, q100PrioritySample,
    q114EpochShuffle, q125Unimax, q126EpochUpsample,
    q214ExactStratifiedSplit)
}
