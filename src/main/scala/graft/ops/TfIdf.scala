package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Term-weighting operators over a tokenized corpus: TF-IDF top-k terms per
  * document and global heavy hitters. The classic retrieval/quality signals
  * a training-data pipeline derives per document before filtering.
  *
  * Scale shape (100 TB):
  *  - one explode + one (doc, term) aggregation over the corpus — THE big
  *    shuffle, proportional to total token count;
  *  - document frequency is a second aggregation over the (doc, term)
  *    TABLE (vocabulary-sized, ≪ corpus) — the tf frame is persisted so the
  *    two consumers share one tokenization pass;
  *  - N (corpus size) is a 1-row aggregate broadcast into the scoring
  *    expression — no driver-side collect in the plan;
  *  - the idf transcendental is computed AFTER rounding-to-6-decimals on
  *    the df values only (thousands of distinct values, not per token
  *    occurrence), keeping the only non-IEEE-exact op off the hot path and
  *    oracle-matchable.
  */
object TfIdf {

  /** (id, term, tf) exact term frequencies: one explode + one aggregation. */
  def termFrequencies(docs: DataFrame, idCol: String, tokens: Column): DataFrame =
    docs.select(col(idCol), explode(tokens).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Top-k terms per document by smoothed TF-IDF
    * (idf = ln((N+1)/(df+1)) + 1, rounded portably to 6 decimals before
    * scoring). Output: (id, term, tf, df, score, rank), rank 1..k by
    * (score desc, term) — a total order, so results are deterministic.
    */
  def topTerms(docs: DataFrame, idCol: String, tokens: Column, k: Int): DataFrame = {
    // Shared by the scoring and document-frequency branches; released by
    // the sealOutput below once the result is materialized (see [[Pins]]).
    val tf = termFrequencies(docs, idCol, tokens)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("_n"))
    val idf = graft.functions.Exact.roundPortable(
      log((col("_n") + 1).cast("double") / (col("df") + 1).cast("double")) + 1.0, 6)
    val scored = tf.join(dft, "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        graft.functions.Exact.roundPortable(col("tf") * idf, 6))
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("term"))
    Pins.sealOutput(
      scored
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col(idCol), col("term"), col("tf"), col("df"), col("score"),
          col("rank")),
      tf)
  }

  /** Sparse term-frequency cosine near-dup pairs: cosine over exact tf
    * vectors restricted to terms whose document frequency is at most
    * `maxDfPerMille`/1000 of the corpus (stop terms carry no near-dup
    * signal and would fan the term join out quadratically — capping df is
    * the standard sparse-similarity-join guard, and it DEFINES the
    * similarity space: norms are computed over the kept terms). The cap
    * is corpus-RELATIVE — `ceil(N·perMille/1000)` in pure integer
    * arithmetic (portable, and the op keeps the same meaning at every
    * scale) — and arrives via a broadcast 1-row aggregate, no driver
    * action. The candidate join is term-partitioned (an inverted-index
    * equi-join — never all-pairs): per-term cost is bounded by cap², the
    * per-pair dot is one exact integer aggregation, and norms attach via
    * two id equi-joins. sqrt and ÷ are IEEE-correctly-rounded —
    * engine-portable without rounding tricks.
    */
  def sparseCosinePairs(docs: DataFrame, idCol: String, tokens: Column,
      maxDfPerMille: Int, minSim: Double): DataFrame = {
    val tf = termFrequencies(docs, idCol, tokens)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = docs.agg(count(lit(1)).as("_n"))
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val kept = tf.join(
      dft.crossJoin(broadcast(n))
        .filter(col("df") <= expr(s"(_n * $maxDfPerMille + 999) DIV 1000"))
        .select("term"), "term")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val norms = kept.groupBy(idCol)
      .agg(sqrt(sum(col("tf") * col("tf")).cast("double")).as("nrm"))
    val a = kept.select(col("term"), col(idCol).as("id_a"), col("tf").as("tf_a"))
    val b = kept.select(col("term"), col(idCol).as("id_b"), col("tf").as("tf_b"))
    val sim = col("dot").cast("double") / (col("nrm_a") * col("nrm_b"))
    Pins.sealOutput(
      a.join(b, "term").filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(sum(col("tf_a") * col("tf_b")).as("dot"))
        .join(norms.select(col(idCol).as("id_a"), col("nrm").as("nrm_a")), "id_a")
        .join(norms.select(col(idCol).as("id_b"), col("nrm").as("nrm_b")), "id_b")
        .filter(sim >= minSim)
        .select(col("id_a"), col("id_b"),
          graft.functions.Exact.roundPortable(sim, 6).as("sim")),
      tf, kept)
  }

  /** Global top-k most frequent terms (exact heavy hitters) with their
    * document frequency. One explode + one aggregation (partial map-side
    * combine collapses the per-partition term counts before the shuffle),
    * then a top-k sort on the vocabulary-sized aggregate — the corpus is
    * scanned once and never sorted.
    */
  def heavyHitters(docs: DataFrame, idCol: String, tokens: Column, k: Int): DataFrame =
    docs.select(col(idCol), explode(tokens).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("freq"), count_distinct(col(idCol)).as("df"))
      .orderBy(col("freq").desc, col("term"))
      .limit(k)
}
