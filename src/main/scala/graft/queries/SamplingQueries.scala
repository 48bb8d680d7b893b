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
  val q125Unimax: Q = {
    val (budget, cap) = (30000L, 2)
    val toks = "list_filter(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' '), t -> len(t) > 0)"
    val allocSql = s"least($cap * o.tokens, st.rem // (o.nl - o.i + 1))"
    Q(
      "q125_unimax_alloc",
      s"""WITH RECURSIVE per AS (
         |  SELECT lang, CAST(SUM(len(l)) AS BIGINT) AS tokens
         |  FROM (SELECT lang, $toks AS l FROM documents) GROUP BY lang
         |), ord AS (
         |  SELECT lang, tokens,
         |    CAST(row_number() OVER (ORDER BY tokens, lang) AS BIGINT) AS i,
         |    CAST(count(*) OVER () AS BIGINT) AS nl
         |  FROM per
         |), st AS (
         |  SELECT CAST(1 AS BIGINT) AS i, CAST($budget AS BIGINT) AS rem
         |  UNION ALL
         |  SELECT st.i + 1, st.rem - $allocSql
         |  FROM st JOIN ord o ON o.i = st.i
         |)
         |SELECT o.lang AS lang, o.tokens AS tokens, $allocSql AS alloc,
         |  ${Exact.roundPortableSql(
              s"CASE WHEN o.tokens > 0 THEN CAST($allocSql AS DOUBLE) / CAST(o.tokens AS DOUBLE) ELSE 0.0 END",
              6)} AS epochs
         |FROM ord o JOIN st ON st.i = o.i
         |ORDER BY lang""".stripMargin) { (s, dir) =>
      graft.ops.Sampling.unimaxAlloc(
          Tables.documentsSpread(s, dir)
            .select(col("lang"), graft.functions.TextAnalysis.tokens(col("text")).as("_t")),
          "lang", size(col("_t")).cast("long"), budget, cap)
        .orderBy("lang")
    }
  }

  val all: Seq[Q] = Seq(q51StratifiedSample, q100PrioritySample,
    q114EpochShuffle, q125Unimax)
}
