package graft

import graft.ops.Upsert

/** CDC latest-wins: newest version wins, tombstones delete, a later
  * re-insert resurrects, base survives untouched keys.
  */
class UpsertSpec extends SparkSuite {
  import spark.implicits._

  private def frame(rows: Seq[(Long, String, Long, Boolean)]) =
    rows.toDF("k", "payload", "ver", "deleted")

  test("latest change wins; tombstone deletes; later insert resurrects") {
    val base = frame(Seq(
      (1L, "base1", -1L, false),
      (2L, "base2", -1L, false),
      (3L, "base3", -1L, false),
      (4L, "base4", -1L, false)))
    val changes = frame(Seq(
      (1L, "upd1a", 10L, false),
      (1L, "upd1b", 20L, false),  // newest for key 1 → wins
      (2L, "del2", 10L, true),    // newest for key 2 → deleted
      (3L, "del3", 10L, true),
      (3L, "res3", 20L, false)))  // delete then re-insert → resurrected
    val out = Upsert.latestWins(base, changes, Seq("k"), Seq("ver"), "deleted")
      .orderBy("k")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "upd1b"), (3L, "res3"), (4L, "base4")))
  }

  test("out-of-order arrival does not change the winner") {
    val base = frame(Seq((1L, "base", -1L, false)))
    val shuffled = frame(Seq(
      (1L, "v3", 30L, false),
      (1L, "v1", 10L, false),
      (1L, "v2", 20L, false)))
    val out = Upsert.latestWins(base, shuffled.repartition(3), Seq("k"),
      Seq("ver"), "deleted")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "v3")))
  }

  test("NULL tombstone means keep, not delete") {
    val base = Seq((1L, "base", -1L, Some(false))).toDF("k", "payload", "ver", "deleted")
    val changes = Seq((1L, "upd", 10L, Option.empty[Boolean]))
      .toDF("k", "payload", "ver", "deleted")
    val out = Upsert.latestWins(base, changes, Seq("k"), Seq("ver"), "deleted")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "upd")))
  }

  test("schema mismatch is rejected") {
    val base = frame(Seq((1L, "b", -1L, false)))
    val bad = Seq((1L, 9L, false)).toDF("k", "ver", "deleted")
    intercept[IllegalArgumentException] {
      Upsert.latestWins(base, bad, Seq("k"), Seq("ver"), "deleted")
    }
  }
}
