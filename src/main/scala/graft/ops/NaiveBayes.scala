package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.Exact

/** Multinomial Naive Bayes text classifier — the trainable stand-in for a
  * fastText-style language-ID / quality filter (the reference pipeline
  * classifies and filters episodes by per-field heuristics; a corpus-scale
  * pipeline trains the filter from labeled data instead:
  * `/root/reference/src/neura_pipeline/validate/validate_one.py:63-147` is
  * the fixed-rule analogue).
  *
  * Everything is counts + one `ln` quantization at the end, so the model is
  * exactly reproducible on any engine and under any partitioning:
  *
  *   - token likelihoods use add-one (Laplace) smoothing:
  *     `P(t|c) = (cnt(c,t) + 1) / (tot(c) + V)`
  *   - unseen tokens back off to `1 / (tot(c) + V)` per class
  *   - all log-probabilities are fixed-point micros
  *     (`floor(ln(x)·1e6 + 0.5)`, the repo-wide scaled-int convention), so
  *     per-document scores are exact BIGINT sums — associative, commutative,
  *     deterministic under any shuffle tree (see [[graft.functions.Exact]]).
  *
  * Scale shape (100 TB corpus): training is ONE map-side-combined
  * `groupBy(label, term)` over exploded tokens — Zipf collapses the corpus
  * to a vocab-sized model table; the scalars (V, N) are single-row
  * aggregates. Inference explodes tokens once, joins the model on the term
  * key (broadcast when the model is small, shuffle-equi-join otherwise —
  * never a cartesian), and reduces with exact Long sums. The per-class
  * fan-out multiplies rows by |classes| (a handful), not by vocab.
  */
object NaiveBayes {

  /** Scaled-int log micros: floor(ln(num/den)·1e6 + 0.5) as Long. */
  private def lnMicros(num: Column, den: Column): Column =
    floor(log(num.cast("double") / den.cast("double")) * 1000000 + 0.5).cast(LongType)

  /** Train: docs(idCol, labelCol) + a token-array column → model parts.
    *
    * Returns (likelihood, classStats):
    *   - likelihood: (label, term, cnt, lpm) — add-one-smoothed token
    *     log-likelihood micros per class;
    *   - classStats: (label, n_docs, tot, prior_lpm, unseen_lpm) — doc
    *     counts, token totals, class prior micros and the per-class
    *     unseen-token backoff micros.
    */
  def train(docs: DataFrame, idCol: String, labelCol: String, toks: Column)
      : (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs
      .select(col(labelCol).as("label"), explode(toks).as("term"))
    val counts = tok.groupBy("label", "term").agg(count(lit(1)).as("cnt"))
    // persist: vocab size, class totals, and the likelihood table all
    // derive from `counts`; without a pin the explode+groupBy runs per
    // consumer. The pin is RELEASED before returning — the model tables are
    // materialized via localCheckpoint below, so nothing stays cached.
    counts.persist()
    // V and N as 1-row broadcast aggregates, NOT driver-side .count()
    // actions: training collapses from 3 sequential driver jobs (vocab
    // count, doc count, then the model build recomputing the lineage) to
    // the two model-materialization jobs — the round-8 q151 finding.
    val vStats = counts.agg(countDistinct(col("term")).as("v")) // 1 row: V
    val nDocs = docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs"))
      // N = Σ n_docs via an all-rows window on the |classes|-row table —
      // no second scan of `docs`, no driver action
      .withColumn("n", sum("n_docs").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val classTotals = counts.groupBy("label").agg(sum("cnt").as("tot"))

    val classStats = nDocs
      .join(classTotals, "label")
      .crossJoin(broadcast(vStats))
      .select(
        col("label"), col("n_docs"), col("tot"),
        lnMicros(col("n_docs"), col("n")).as("prior_lpm"),
        lnMicros(lit(1L), col("tot") + col("v")).as("unseen_lpm"))

    val likelihood = counts
      .join(classTotals, "label")
      .crossJoin(broadcast(vStats))
      .select(
        col("label"), col("term"), col("cnt"),
        lnMicros(col("cnt") + 1, col("tot") + col("v")).as("lpm"))
    // Materialize the model eagerly (localCheckpoint pins the vocab-sized
    // result as RDD blocks, freed by GC like Dedup/Cluster's pins), then
    // drop the counts cache — callers get self-contained model tables and
    // the session's cache manager stays empty (round-8 verdict #2).
    val likOut = likelihood.localCheckpoint()
    val statsOut = classStats.localCheckpoint()
    counts.unpersist()
    (likOut, statsOut)
  }

  /** Classify `test` docs with a model trained by [[train]]: per document,
    * argmax over classes of `prior + Σ_tokens lpm(class, token)` with the
    * per-class unseen backoff for tokens the class never saw. Ties break on
    * ascending label so the argmax is total-order deterministic.
    *
    * Output: (idCol, pred_label, score_lpm) — score in exact micros.
    */
  def classify(test: DataFrame, idCol: String, toks: Column,
      likelihood: DataFrame, classStats: DataFrame,
      broadcastModel: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = test.select(col(idCol), explode(toks).as("term"))
    // fan out per class: classStats is |classes| rows (always broadcast);
    // the likelihood table is vocab-sized — broadcast by default, or a
    // (label, term)-keyed shuffle equi-join for a 100 TB-corpus vocab that
    // exceeds the broadcast budget (caller flips the flag; Zipf keeps even
    // web-scale vocabs in the low GB, so broadcast is the common case).
    val model = likelihood.select("label", "term", "lpm")
    val perClass = tok
      .crossJoin(broadcast(classStats.select("label", "unseen_lpm")))
      .join(if (broadcastModel) broadcast(model) else model,
        Seq("label", "term"), "left")
      .select(col(idCol), col("label"),
        coalesce(col("lpm"), col("unseen_lpm")).as("contrib"))
    val scored = perClass
      .groupBy(col(idCol), col("label"))
      .agg(sum("contrib").as("tok_lpm"))
      .join(broadcast(classStats.select("label", "prior_lpm")), "label")
      .select(col(idCol), col("label"),
        (col("tok_lpm") + col("prior_lpm")).as("score_lpm"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("score_lpm").desc, col("label").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col(idCol), col("label").as("pred_label"), col("score_lpm"))
  }
}
