package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** χ² feature selection over a labeled document corpus (Yang & Pedersen
  * ICML'97): for each (class, term), the 2×2 document-presence contingency
  *
  *          in class   not in class
  *   term       a           b
  *   no term    c           d
  *
  * scored with χ² = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)), and the top-k
  * most-indicative terms kept per class — the vocabulary pruner run before
  * training a quality/language classifier (NaiveBayes) so the model join
  * key stays small.
  *
  * Determinism contract: a/b/c/d are exact BIGINT document counts; χ² is
  * evaluated in ONE pinned IEEE sequence (integer subexpressions cast to
  * double, products folded left-to-right, a single division) and floored
  * to micros, so any ANSI engine replays the score bit-for-bit — no ln, no
  * engine-specific math. Ties after rounding break on the term string.
  *
  * Plan shape: one (doc, term)-presence explode feeds a (term, label)
  * groupBy; class sizes and the corpus total are broadcast 1-row/row-per-
  * class joins; the per-class top-k is the rank-filter idiom, which Spark
  * plans with a map-side WindowGroupLimit (O(classes·k) rows through the
  * final exchange). Only terms PRESENT in a class compete for its top-k —
  * the positive-indicator contract (absence-driven χ² ranks a different
  * signal and would make every class's candidate set vocabulary-sized).
  */
object FeatureSelect {

  def chiSquaredTopK(docs: DataFrame, idCol: String, labelCol: String,
      toks: Column, k: Int): DataFrame = {
    val present = docs
      .select(col(idCol), col(labelCol).as("label"),
        explode(array_distinct(toks)).as("term"))
    val termClass = present.groupBy("term", "label")
      .agg(count(lit(1)).as("a"))
    val termTotals = termClass.groupBy("term")
      .agg(sum(col("a")).as("_t_total"))
    val classTotals = docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("_n_class"))
    val total = docs.agg(count(lit(1)).as("_n"))

    val d = (c: Column) => c.cast("double")
    // termTotals is vocabulary-sized — a shuffled equi-join on the term key
    // (same partitioning the counts already have); only the row-per-class
    // and 1-row totals are forced broadcasts
    val enriched = termClass
      .join(termTotals, "term")
      .join(broadcast(classTotals), "label")
      .crossJoin(broadcast(total))
      // a corpus-universal term has an all-zero "no term" row (c+d = 0 ⇒
      // χ² divides by zero, and engines disagree on double/0) and carries
      // no class signal — drop it before scoring. Symmetrically (round-15
      // hot-key sweep find) a corpus-universal CLASS — every doc one
      // label, i.e. a single-class corpus — has an all-zero "not in
      // class" column (b+d = 0) and the same zero denominator: no term
      // can discriminate the only class, so those rows drop too and a
      // single-class corpus yields the EMPTY top-k rather than an engine
      // DIVIDE_BY_ZERO. After both guards every denominator factor is
      // strictly positive: a+b = _t_total ≥ 1, a+c = _n_class ≥ 1,
      // c+d = _n − _t_total ≥ 1, b+d = _n − _n_class ≥ 1.
      .where(col("_t_total") < col("_n") && col("_n_class") < col("_n"))
      .withColumn("b", col("_t_total") - col("a"))
      .withColumn("c", col("_n_class") - col("a"))
      .withColumn("dd", col("_n") - col("_n_class") - col("b"))
    // pinned sequence: diff = ad−bc exact in BIGINT (≤ N² ≈ 2.5e7² at
    // sf0.1 — within long), then double products left-to-right
    val diff = col("a") * col("dd") - col("b") * col("c")
    val chi2 = ((d(col("_n")) * d(diff)) * d(diff)) /
      (((d(col("a") + col("b")) * d(col("c") + col("dd"))) *
        d(col("a") + col("c"))) * d(col("b") + col("dd")))
    val w = Window.partitionBy(col("label"))
      .orderBy(col("chi2_micros").desc, col("term"))
    enriched
      .withColumn("chi2_micros", floor(chi2 * 1000000 + 0.5).cast("long"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("label"), col("rnk").cast("long").as("rnk"), col("term"),
        col("a"), col("b"), col("c"), col("dd").as("d"), col("chi2_micros"))
  }
}
