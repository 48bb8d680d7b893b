package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training (Sennrich et al. ACL'16) — the
  * merge-table learner behind GPT-2/LLaMA-style tokenizers, expressed in
  * the shape that scales:
  *
  *  - the corpus is touched ONCE — a word-frequency aggregation (Zipf
  *    collapses 100 TB of text to a ~1e7-row vocab table);
  *  - every merge round then runs on the VOCAB table only: one
  *    explode+groupBy for weighted pair counts, one `TakeOrdered(1)` for
  *    the argmax (never a full sort), one broadcast-literal rewrite of the
  *    symbol arrays;
  *  - the greedy left-to-right merge is a per-row `aggregate()` fold over
  *    the symbol array — codegen'd, zero UDFs, no shuffle;
  *  - round state is a rolling `localCheckpoint` of the vocab table, so
  *    the plan never deepens with the merge count.
  *
  * Driver traffic is ONE ROW per round (the argmax pair) — the same
  * bounded-collect contract as [[IvfIndex]]'s centroids.
  *
  * Determinism: pair ties break (count desc, left, right) — byte-identical
  * merge tables on any partitioning, and SQL-replayable (the q147 oracle
  * replays every round, fold included, in DuckDB).
  */
object BpeTrain {

  /** One learned merge. */
  final case class Merge(step: Int, left: String, right: String, count: Long)

  /** Corpus → word-frequency table (`word`, `freq`), using the engine's
    * BPE-ish pre-tokenization ([a-z]+ runs of the ASCII-lowered text —
    * [[graft.functions.TextAnalysis.alphaTokens]]).
    */
  def wordFreq(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(graft.functions.TextAnalysis.alphaTokens(col(textCol)))
        .as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))

  /** Initial symbol column: one single-character symbol per char. */
  private def initialSymbols(word: Column): Column =
    transform(sequence(lit(1), length(word)), i => substring(word, i, lit(1)))

  /** Greedy left-to-right application of one merge (left,right)→left+right
    * as a fold over the symbol array. A run like "aaa" under merge (a,a)
    * becomes ["aa","a"] — the fold can never re-merge its own output
    * because the merged symbol is strictly longer than `left`.
    */
  private def applyMerge(syms: Column, left: String, right: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      // get() is 0-based and NULL-safe on the empty accumulator — ANSI
      // element_at(-1) throws before when() can guard it
      when(get(acc, size(acc) - 1) === lit(left) && x === lit(right),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(left + right))))
        .otherwise(concat(acc, array(x))))

  /** Learn `nMerges` BPE merges from a (`word`, `freq`) table. Returns the
    * merge list in learned order (may be shorter than `nMerges` if the
    * vocabulary is exhausted) and the final symbolized vocab table
    * (`word`, `freq`, `syms`).
    */
  def train(words: DataFrame, nMerges: Int): (Seq[Merge], DataFrame) = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    var vocab = words
      .select(col("word"), col("freq").cast("long").as("freq"),
        initialSymbols(col("word")).as("syms"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var exhausted = false
    for (step <- 0 until nMerges if !exhausted) {
      // weighted adjacent-pair counts over the vocab table. Index-free
      // zip_with over shifted slices: sequence(1, size-1) would run
      // DESCENDING [1,0] for single-symbol words and element_at(syms, 0)
      // throws under ANSI; slice() degrades to [] instead.
      val syms = col("syms")
      val pairCounts = vocab
        .select(col("freq"), explode(zip_with(
          slice(syms, lit(1), size(syms) - 1),
          slice(syms, lit(2), size(syms) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
      // argmax with total-order tiebreak; TakeOrdered(1), not a sort
      val top = pairCounts
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(step, l, r, c)
        val prev = vocab
        vocab = vocab
          .withColumn("syms", applyMerge(col("syms"), l, r))
          .localCheckpoint() // rolling: plan depth stays O(1) per round
        prev.unpersist(blocking = false)
      }
    }
    (merges.toSeq, vocab)
  }

  /** End-to-end: corpus text column → merge table DataFrame
    * (`step`, `lhs`, `rhs`, `pair_count`), ordered by step.
    */
  def learnMerges(df: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val (merges, vocab) = train(wordFreq(df, textCol), nMerges)
    vocab.unpersist(blocking = false)
    val spark = df.sparkSession
    import spark.implicits._
    merges.toDF("step", "lhs", "rhs", "pair_count").orderBy("step")
  }

  /** Tokenize `textCol` with a learned merge list: per-word symbol fold,
    * merges applied in learned order (the inference-time half of BPE).
    * Returns the input plus `bpe_tokens` (array of symbol strings) — a
    * map-only projection, no shuffle, merge rules inlined as codegen'd
    * literals.
    */
  def encode(df: DataFrame, textCol: String, merges: Seq[Merge]): DataFrame = {
    def applyAll(word: Column): Column =
      merges.sortBy(_.step).foldLeft(initialSymbols(word)) { (syms, m) =>
        applyMerge(syms, m.left, m.right)
      }
    df.withColumn("bpe_tokens",
      flatten(transform(graft.functions.TextAnalysis.alphaTokens(col(textCol)),
        w => applyAll(w))))
  }
}
