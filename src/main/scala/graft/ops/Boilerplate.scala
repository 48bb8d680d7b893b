package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Passage-level boilerplate removal (the C4/RefinedWeb curation step):
  * documents are segmented into fixed-size token passages; a passage that
  * recurs across ≥ `minDocs` DISTINCT documents is boilerplate (headers,
  * navigation, license blocks — template text), and the cleaned document
  * is rebuilt from its remaining passages in order.
  *
  * Scale shape: segmentation is a per-row explode (map-side); the global
  * passage census is one (passage → distinct-doc-count) aggregation; the
  * boilerplate SET (rare by construction — threshold picks the recurring
  * tail) broadcasts back onto the segment stream, so the corpus shuffles
  * once for the census and once for the per-doc rebuild. Rebuild order is
  * carried by the segment index inside a sorted struct array —
  * deterministic under any shuffle topology.
  */
object Boilerplate {

  /** (id, seg_idx, seg) — consecutive `width`-token passages per doc.
    * Empty-token docs produce no rows.
    */
  def segments(docs: DataFrame, idCol: String, tokens: Column, width: Int): DataFrame = {
    // width = 0 would reach the ÷width chunk count as an ANSI
    // divide-by-zero (round-13 division audit): refuse at the API edge
    require(width > 0, s"segment width must be > 0, got $width")
    docs
      .select(col(idCol), tokens.as("_toks"))
      .filter(size(col("_toks")) > 0)
      .select(col(idCol),
        explode(sequence(lit(0),
          ((size(col("_toks")) + (width - 1)) / width).cast("long") - 1)).as("seg_idx"),
        col("_toks"))
      .select(col(idCol), col("seg_idx"),
        array_join(slice(col("_toks"),
          (col("seg_idx") * width + 1).cast("int"), lit(width)), " ").as("seg"))
  }

  /** Cross-corpus exact passage dedup, keep-FIRST occurrence (the
    * RefinedWeb-style exact-substring dedup at passage granularity — the
    * complement of [[clean]], which removes EVERY copy of a recurring
    * passage): of all copies of a passage, only the one at the lowest
    * (id, seg_idx) survives; each document is rebuilt from its surviving
    * passages in order. Returns (id, n_segments, n_removed, clean_text),
    * `clean_text` null when no passage survives.
    *
    * Scale shape: one shuffle for the per-passage keep-first window (the
    * window key is the passage text, so hot passages concentrate — at
    * extreme skew pre-hash the passage to spread the sort, the winner is
    * unchanged), one groupBy for the per-doc rebuild. Keep-first by
    * (id, seg_idx) is a total order — deterministic on any topology.
    */
  def dedupPassagesKeepFirst(docs: DataFrame, idCol: String, tokens: Column,
      width: Int): DataFrame = {
    val w = Window.partitionBy("seg").orderBy(col(idCol), col("seg_idx"))
    segments(docs, idCol, tokens, width)
      .withColumn("_rn", row_number().over(w))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_segments"),
        sum(when(col("_rn") > 1, 1L).otherwise(0L)).as("n_removed"),
        nullif(array_join(
          transform(
            filter(sort_array(collect_list(struct(col("seg_idx"), col("_rn"), col("seg")))),
              s => s.getField("_rn") === 1),
            s => s.getField("seg")),
          " "), lit("")).as("clean_text"))
  }

  /** Per-document boilerplate census + cleaned text: (id, n_segments,
    * n_boilerplate, clean_text). `clean_text` is null when every passage
    * is boilerplate.
    */
  def clean(docs: DataFrame, idCol: String, tokens: Column, width: Int,
      minDocs: Int): DataFrame = {
    val segs = segments(docs, idCol, tokens, width)
      .persist(StorageLevel.MEMORY_AND_DISK) // census + rebuild share one pass
    val bp = segs.groupBy("seg")
      .agg(count_distinct(col(idCol)).as("_df"))
      .filter(col("_df") >= minDocs)
      .select(col("seg"), lit(true).as("_bp"))
    Pins.sealOutput(
      segs
        .join(broadcast(bp), Seq("seg"), "left")
        .withColumn("_is_bp", coalesce(col("_bp"), lit(false)))
        .groupBy(idCol)
        .agg(
          count(lit(1)).as("n_segments"),
          sum(when(col("_is_bp"), 1L).otherwise(0L)).as("n_boilerplate"),
          nullif(array_join(
            transform(
              filter(sort_array(collect_list(struct(col("seg_idx"), col("_is_bp"), col("seg")))),
                s => !s.getField("_is_bp")),
              s => s.getField("seg")),
            " "), lit("")).as("clean_text")),
      segs)
  }
}
