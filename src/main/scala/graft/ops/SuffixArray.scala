package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** L-bounded word-level suffix array + adjacent-LCP repeated-substring
  * detection — the exact substring-dedup signal of "Deduplicating Training
  * Data Makes Language Models Better" (Lee et al., ACL 2022), which builds a
  * corpus suffix array and removes spans that recur verbatim. The fixed
  * n-gram hash approach (q39 duplicated 8-token spans) can only answer "does
  * this exact-length window repeat"; the suffix array answers "what is the
  * LONGEST span starting here that repeats anywhere", which is the quantity
  * the paper thresholds on.
  *
  * Design for a 100 TB corpus:
  *   - suffixes start at WORD boundaries (the unit dedup actually operates
  *     on) and comparisons are bounded at `maxLen` chars, so a suffix is a
  *     fixed-width window, never an unbounded string;
  *   - with bounded windows the optimal Spark plan is a single
  *     range-partitioned sort (O(n log n) comparisons of ≤L-byte keys, fully
  *     parallel) — prefix-doubling's O(log n) shuffle rounds only pay off
  *     when suffixes are unbounded, so we deliberately do NOT use it;
  *   - ranking uses [[PrefixSum.rowNumber]] (two-pass, O(partitions) driver
  *     traffic), never a partition-less window;
  *   - the LCP pass is one self-equi-join on adjacent ranks plus a
  *     codegen'd zip_with/array_position first-mismatch expression — no
  *     UDFs, no per-char shuffle.
  *
  * The word-start fold assumes single-space separation contractually
  * (consecutive separators yield empty words that advance the offset
  * without emitting a start, so the fold is still exact on multi-space
  * text).
  */
object SuffixArray {

  /** 1-based char offsets of word starts, as an array column. */
  private def wordStarts(text: Column): Column =
    aggregate(
      split(text, " "),
      struct(lit(1L).as("pos"), array().cast("array<long>").as("starts")),
      (acc, w) => struct(
        (acc.getField("pos") + length(w) + 1L).as("pos"),
        when(length(w) > 0,
            array_append(acc.getField("starts"), acc.getField("pos")))
          .otherwise(acc.getField("starts")).as("starts")),
      acc => acc.getField("starts"))

  /** Length of the common prefix of two (≤L-char) strings: first mismatch
    * position via zip_with equality (shorter side null-padded; nulls are
    * skipped by array_position, so "one is a prefix of the other" falls
    * through to min-length).
    */
  def lcp(a: Column, b: Column): Column = {
    val eq = zip_with(split(a, ""), split(b, ""), (x, y) => x === y)
    val firstFalse = array_position(eq, lit(false))
    when(firstFalse === 0, least(length(a), length(b)).cast(LongType))
      .otherwise(firstFalse - 1L)
  }

  /** The suffix table: (idCol, off, w) — one row per word start with its
    * `maxLen`-bounded forward window.
    */
  def suffixes(docs: DataFrame, idCol: String, textCol: String,
      maxLen: Int): DataFrame =
    docs
      .select(col(idCol), col(textCol),
        explode(wordStarts(col(textCol))).as("off"))
      .select(col(idCol), col("off"),
        col(textCol).substr(col("off"), lit(maxLen)).as("w"))

  /** The L-bounded word suffix array: suffixes ranked 1..n in
    * (window, idCol, off) order — a total order, so ranks are deterministic
    * under any partitioning.
    */
  def build(docs: DataFrame, idCol: String, textCol: String,
      maxLen: Int): DataFrame =
    PrefixSum.rowNumber(suffixes(docs, idCol, textCol, maxLen),
      Seq("w", idCol, "off"), "rank")

  /** Per-document repeated-substring profile. For every suffix, its repeat
    * length = max LCP with the suffixes ranked immediately before/after it
    * (in suffix-array order, the most-similar suffixes are always adjacent,
    * so the max over the two neighbors IS the max over the whole corpus —
    * the classic SA+LCP argument). Returns one row per doc:
    * (idCol, n_suffixes, max_rep_len, n_dup) where n_dup counts suffixes
    * whose repeat length ≥ `dupLen`.
    */
  def repeatProfile(docs: DataFrame, idCol: String, textCol: String,
      maxLen: Int, dupLen: Int): DataFrame = {
    val sa = build(docs, idCol, textCol, maxLen)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one row per adjacent pair (r, r+1): lcp of the two windows
    val pairs = sa.select(col("rank").as("r"), col("w").as("wa"))
      .join(sa.select((col("rank") - 1L).as("r"), col("w").as("wb")), "r")
      .select(col("r"), lcp(col("wa"), col("wb")).as("lcp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rep = sa
      .join(pairs.select((col("r") + 1L).as("rank"), col("lcp").as("lcp_prev")),
        Seq("rank"), "left")
      .join(pairs.select(col("r").as("rank"), col("lcp").as("lcp_next")),
        Seq("rank"), "left")
      .select(col(idCol), col("off"),
        greatest(coalesce(col("lcp_prev"), lit(0L)),
          coalesce(col("lcp_next"), lit(0L))).as("rep_len"))
    Pins.sealOutput(
      rep.groupBy(idCol)
        .agg(
          count(lit(1)).as("n_suffixes"),
          max("rep_len").as("max_rep_len"),
          sum(when(col("rep_len") >= dupLen, 1L).otherwise(0L)).as("n_dup")),
      sa, pairs)
  }
}
