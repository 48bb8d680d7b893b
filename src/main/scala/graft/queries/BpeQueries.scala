package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.BpeTrain

/** BPE tokenizer-training gate: the full merge-learning loop (pair counts →
  * argmax → greedy merge, per round) replayed in the oracle, fold included.
  */
object BpeQueries {

  /** Rounds gated. Fixed because the oracle unrolls one CTE stage chain per
    * round; 6 is enough to exercise a second-order merge (a pair whose left
    * side is itself a merged symbol — step 5 is ('m','er') at sf0.01).
    */
  private val NMerges = 6

  /** DuckDB replay of the whole trainer. Stage k: `p{k}` weighted pair
    * counts over vocab `w{k}`, `r{k}` the (cnt desc, l, r) argmax, `f{k}` a
    * recursive position-fold applying the merge greedily left-to-right
    * (exactly [[BpeTrain.applyMerge]]'s aggregate() semantics), `w{k+1}`
    * the folded vocab. CTEs are MATERIALIZED — without it DuckDB re-inlines
    * every upstream stage into each recursion step and the chain goes
    * exponential (measured: >2 min unmaterialized, 0.5 s materialized).
    */
  private def oracleSql(n: Int): String = oracleStages(n, foldLast = false) + {
    val union = (0 until n).map(k =>
      s"SELECT $k AS step, l AS lhs, r AS rhs, cnt AS pair_count FROM r$k")
      .mkString("\nUNION ALL\n")
    s"\nSELECT * FROM (\n$union\n) ORDER BY step"
  }

  /** Shared CTE chain; `foldLast` additionally folds the final merge into
    * `w{n}` (needed when the consumer reads the final vocab, not just the
    * merge table).
    */
  private def oracleStages(n: Int, foldLast: Boolean): String = {
    val lower =
      "translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')"
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    parts += s"""wf AS MATERIALIZED (
                |  SELECT t AS word, CAST(count(*) AS BIGINT) AS freq
                |  FROM (SELECT unnest(regexp_extract_all($lower, '[a-z]+')) AS t
                |        FROM documents)
                |  GROUP BY t
                |)""".stripMargin
    parts += """w0 AS MATERIALIZED (
               |  SELECT word, freq,
               |    list_transform(generate_series(1, len(word)), i -> word[i:i]) AS syms
               |  FROM wf
               |)""".stripMargin
    for (k <- 0 until n) {
      parts += s"""p$k AS MATERIALIZED (
                  |  SELECT p[1] AS l, p[2] AS r, CAST(sum(freq) AS BIGINT) AS cnt
                  |  FROM (SELECT freq,
                  |      unnest(list_transform(generate_series(1, len(syms)-1),
                  |        i -> [syms[i], syms[i+1]])) AS p
                  |    FROM w$k)
                  |  GROUP BY 1, 2
                  |)""".stripMargin
      parts += s"""r$k AS MATERIALIZED (
                  |  SELECT l, r, cnt FROM p$k ORDER BY cnt DESC, l, r LIMIT 1
                  |)""".stripMargin
      if (k < n - 1 || foldLast) {
        parts += s"""f$k(word, freq, pos, n, acc) AS (
                    |  SELECT word, freq, 1, len(syms), [syms[1]] FROM w$k WHERE len(syms) >= 1
                    |  UNION ALL
                    |  SELECT f.word, f.freq, f.pos + 1, f.n,
                    |    CASE WHEN f.acc[-1] = r.l AND s.syms[f.pos + 1] = r.r
                    |         THEN list_append(f.acc[1:len(f.acc)-1], r.l || r.r)
                    |         ELSE list_append(f.acc, s.syms[f.pos + 1]) END
                    |  FROM f$k f JOIN w$k s ON s.word = f.word CROSS JOIN r$k r
                    |  WHERE f.pos < f.n
                    |)""".stripMargin
        parts += s"""w${k + 1} AS MATERIALIZED (
                    |  SELECT word, freq, acc AS syms FROM f$k WHERE pos = n
                    |)""".stripMargin
      }
    }
    "WITH RECURSIVE\n" + parts.mkString(",\n")
  }

  /** Distributed BPE merge learning (ops/BpeTrain): 6 merge rounds over the
    * documents corpus, merge table hash-checked against the full DuckDB
    * replay — pair counts, argmax tiebreak, and the greedy fold all
    * mirrored round by round.
    */
  val q147BpeMerges: Q = Q("q147_bpe_merges", oracleSql(NMerges)) { (s, dir) =>
    BpeTrain.learnMerges(Tables.documents(s, dir), "text", NMerges)
  }

  /** The inference half ([[BpeTrain.encode]]): the corpus re-tokenized with
    * the 6 learned merges, reduced to corpus-level totals. Engine side
    * encodes every DOCUMENT with the merge rules as codegen'd literals (a
    * map-only projection); the oracle folds the VOCAB table through the
    * same 6 merges (`w6`) and weights by word frequency — the two agree
    * exactly because the greedy fold is a pure function of the word, which
    * is what makes train-once-encode-anywhere sound at 100 TB (merges
    * broadcast as literals; no join against a vocab table at encode time).
    */
  val q148BpeEncode: Q = Q(
    "q148_bpe_encode",
    oracleStages(NMerges, foldLast = true) +
      s"""
         |SELECT CAST(sum(freq) AS BIGINT) AS n_words,
         |  CAST(sum(freq * len(syms)) AS BIGINT) AS n_tokens,
         |  CAST(sum(freq * len(word)) AS BIGINT) AS n_chars
         |FROM w$NMerges""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val (merges, vocab) = BpeTrain.train(BpeTrain.wordFreq(docs, "text"), NMerges)
    vocab.unpersist(blocking = false)
    BpeTrain.encode(docs, "text", merges)
      .select(
        size(graft.functions.TextAnalysis.alphaTokens(col("text"))).as("_w"),
        size(col("bpe_tokens")).as("_t"),
        aggregate(graft.functions.TextAnalysis.alphaTokens(col("text")),
          lit(0L), (acc, w) => acc + length(w)).as("_c"))
      .agg(sum("_w").as("n_words"), sum("_t").as("n_tokens"),
        sum("_c").as("n_chars"))
  }

  val all: Seq[Q] = Seq(q147BpeMerges, q148BpeEncode)
}
