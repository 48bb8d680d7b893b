package graft

import org.apache.spark.sql.functions._
import graft.core.{FeatureStats, GlobalStats, Schemas, StatsDoc}
import graft.io.Episodes
import graft.stages.AlignTransform

/** Stage 4 oracle tests: dirty episodes come out sorted, deduped (keep
  * first), reindexed 0..N-1, width-enforced, normalized.
  */
class AlignTransformSpec extends SparkSuite {
  import FixtureGen._
  import graft.core.Models.Frame

  test("sort + dedup-keep-first + reindex on a dirty episode") {
    val root = tmpDir("align_fix")
    // frames out of order with a duplicate frame_index whose FIRST
    // occurrence (in file order) carries the original payload
    val clean = cleanFrames(0, 10)
    val dirty = Seq(clean(3), clean(1), clean(1).copy(action = clean(1).action.map(_ + 500f)),
      clean(0), clean(2), clean(5))
    dataset(spark, root, Map(0L -> dirty))
    val raw = Episodes.readDataDir(spark, s"$root/data")
    val out = AlignTransform.transformFrames(raw, None, normalize = false)
      .orderBy("frame_index")

    val rows = out.select(col("frame_index"), col("timestamp"),
      element_at(col("action"), 1).as("a0")).collect()
    // 5 distinct original frame_index values (3,1,0,2,5) → reindexed 0..4
    assert(rows.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L, 3L, 4L))
    // sorted by original frame_index: 0,1,2,3,5 → timestamps in that order
    assert(rows.map(_.getDouble(1)).toSeq ===
      Seq(clean(0), clean(1), clean(2), clean(3), clean(5)).map(_.timestamp))
    // dedup kept the FIRST in-file occurrence of frame 1 (original payload)
    val a0OfFrame1 = rows(1).getAs[Float]("a0")
    assert(a0OfFrame1 === clean(1).action.head)
  }

  test("width filter drops rows with wrong vector width") {
    val root = tmpDir("align_width")
    val clean = cleanFrames(0, 6)
    val mixed = clean.take(3).map(f => f.copy(action = f.action.take(7))) ++ clean.drop(3)
    dataset(spark, root, Map(0L -> mixed))
    val raw = Episodes.readDataDir(spark, s"$root/data")
    val out = AlignTransform.transformFrames(raw, None, normalize = false)
    assert(out.count() === 3)
  }

  test("z-score normalization matches (v-mean)/std with std=0 → divide by 1") {
    val root = tmpDir("align_norm")
    val frames = cleanFrames(0, 4)
    dataset(spark, root, Map(0L -> frames))
    val mean = (1 to 8).map(_.toDouble)
    val std = Seq(2.0, 2.0, 2.0, 0.0, 2.0, 2.0, 2.0, 2.0) // dim 4 unscaled
    val gs = GlobalStats(1, 4, "test", Map(
      "action" -> FeatureStats(4, mean, std, mean, mean),
      Schemas.ObsStateStorage -> FeatureStats(4, mean, std, mean, mean)))
    val raw = Episodes.readDataDir(spark, s"$root/data")
    val out = AlignTransform.transformFrames(raw, Some(gs), normalize = true)
      .orderBy("frame_index")
    val got = out.select(col("action")).head().getSeq[Float](0)
    val expected = frames.head.action.zipWithIndex.map { case (v, i) =>
      ((v - mean(i)) / (if (std(i) != 0) std(i) else 1.0)).toFloat
    }
    assert(got === expected)
  }

  test("malformed stats (wrong width) silently skips normalization") {
    val root = tmpDir("align_badstats")
    val frames = cleanFrames(0, 4)
    dataset(spark, root, Map(0L -> frames))
    val gs = GlobalStats(1, 4, "test", Map(
      "action" -> FeatureStats(4, Seq(1.0, 2.0), Seq(1.0, 1.0), Seq(0.0), Seq(9.9))))
    val raw = Episodes.readDataDir(spark, s"$root/data")
    val out = AlignTransform.transformFrames(raw, Some(gs), normalize = true)
      .orderBy("frame_index")
    assert(out.select("action").head().getSeq[Float](0) === frames.head.action)
  }

  test("full run writes one parquet per episode with the original name") {
    val root = tmpDir("align_run")
    val outDir = tmpDir("align_out")
    // episode 5: all rows have 7-wide vectors -> every row filtered -> the
    // output file must still exist, empty (reference writes unconditionally)
    dataset(spark, root, Map(0L -> cleanFrames(0, 8), 3L -> cleanFrames(3, 5),
      5L -> Defects.wrongWidth(5, 4)))
    val written = AlignTransform.run(spark, s"$root/data", outDir, None)
    assert(written.map(_.split("/").last).sorted ===
      Seq("episode_000000.parquet", "episode_000003.parquet", "episode_000005.parquet"))
    val ep0 = spark.read.parquet(written.head)
    assert(ep0.columns.toSet === Schemas.RequiredEpisodeCols.toSet)
    assert(ep0.count() === 8)
    val ep5 = spark.read.parquet(s"$outDir/episode_000005.parquet")
    assert(ep5.count() === 0)
    assert(ep5.columns.toSet === Schemas.RequiredEpisodeCols.toSet)
  }

  test("stats doc round-trip: render → parse") {
    val gs = GlobalStats(10, 300, "src", Map(
      "action" -> FeatureStats(300, Seq(1.5, 2.0), Seq(0.1, 0.2), Seq(0.0, 1.0), Seq(3.0, 4.0))))
    val text = StatsDoc.render(gs, Seq("action"), "note")
    val parsed = StatsDoc.parse(text).get
    assert(parsed.features("action").mean === Seq(1.5, 2.0))
    assert(parsed.episodesUsed === 10)
    assert(StatsDoc.parse("not json{{{") === None)
    assert(StatsDoc.parse("""{"action": {"mean": [1], "std": "bad"}}""").get.features === Map.empty)
  }
}
