package graft

import org.apache.spark.sql.functions._
import graft.ops.Boilerplate

/** Passage boilerplate removal: recurring passages stripped, rebuild
  * preserves order, all-boilerplate docs yield null clean text,
  * sub-threshold recurrence survives.
  */
class BoilerplateSpec extends SparkSuite {
  import spark.implicits._

  // width=2 passages; "x y" appears in 3 docs (boilerplate at minDocs=3),
  // "p q" in only 2 (kept)
  private val docs = Seq(
    (1L, "x y a b c d"),
    (2L, "p q x y e f"),
    (3L, "g h p q x y"),
    (4L, "x y")).toDF("doc_id", "text")

  test("recurring passages stripped in order; full-boilerplate doc → null") {
    val out = Boilerplate.clean(docs, "doc_id", split(col("text"), " "),
      width = 2, minDocs = 3)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.getString(3))))
    assert(out.toSeq == Seq(
      (1L, 3L, 1L, Some("a b c d")),
      (2L, 3L, 1L, Some("p q e f")),
      (3L, 3L, 1L, Some("g h p q")),
      (4L, 1L, 1L, None)))
  }

  test("dedupPassagesKeepFirst keeps only the first (doc, position) copy of each passage") {
    val out = Boilerplate.dedupPassagesKeepFirst(docs, "doc_id",
      split(col("text"), " "), width = 2)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), Option(r.getString(3))))
    // "x y" first occurs in doc 1 seg 0 → survives there, removed in 2/3/4;
    // "p q" first occurs in doc 2 seg 0 → survives there, removed in doc 3
    assert(out.toSeq == Seq(
      (1L, 3L, 0L, Some("x y a b c d")),
      (2L, 3L, 1L, Some("p q e f")),
      (3L, 3L, 2L, Some("g h")),
      (4L, 1L, 1L, None)))
  }

  test("ragged final passage segments correctly") {
    val ragged = Seq((9L, "a b c")).toDF("doc_id", "text")
    val segs = Boilerplate.segments(ragged, "doc_id", split(col("text"), " "), 2)
      .orderBy("seg_idx")
      .collect().map(r => (r.getLong(1), r.getString(2)))
    assert(segs.toSeq == Seq((0L, "a b"), (1L, "c")))
  }
}
