package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.core.{Schemas, StatsDoc, Status}

/** End-to-end golden run: the five-stage `cli.Main pipeline` over a
  * synthesized corpus with known totals and planted defects (the bundled
  * reference dataset ships only meta/, so the golden corpus is generated
  * with the same layout: data/chunk-*, meta/episodes*.jsonl, videos/).
  * Asserts the cross-stage invariants the reference pipeline guarantees:
  * manifest statuses, frame totals, global stats vs the flat recompute,
  * split-count conservation, and video placement.
  */
class PipelineE2ESpec extends SparkSuite {
  import FixtureGen._

  test("pipeline: discover → validate → stats → align-transform → materialize") {
    val root = tmpDir("e2e_root")
    val outRoot = s"$root/out"
    val episodes = Map(
      0L -> cleanFrames(0, 40),
      1L -> cleanFrames(1, 35),
      2L -> Defects.dupFrames(2, 30),  // 31 raw rows, 30 after dedup
      3L -> Defects.unsorted(3, 25),
      4L -> cleanFrames(4, 20))
    val expectedFrames = Map(0L -> 40L, 1L -> 35L, 2L -> 30L, 3L -> 25L, 4L -> 20L)
    dataset(spark, root, episodes,
      videosFor = Set(0L, 1L, 2L, 3L), // episode 4 → MISSING_SIDE
      metaLengths = expectedFrames)
    Files.write(Paths.get(s"$root/meta/episodes_stats.jsonl"),
      statsJsonl(episodes).getBytes)

    // --skip-video: the CLI default (reference parity) probes videos, but
    // the test container has no ffprobe — every episode would degrade to
    // <cam>_video_missing and fail validation
    cli.Main.run(spark, List("pipeline", root, outRoot, "--skip-video"))

    // --- manifest statuses
    val manifest = spark.read.parquet(s"$outRoot/manifest/episodes.parquet")
    val statuses = manifest.select("episode_index", "status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(statuses === Map(0L -> Status.New, 1L -> Status.New, 2L -> Status.New,
      3L -> Status.New, 4L -> Status.MissingSide))

    // --- validation: ep2 (dup frame_index) and ep3 (unsorted) fail; the
    // valid set {0, 1, 4} feeds the stats stage via validated_episodes.jsonl
    assert(Files.exists(Paths.get(s"$outRoot/validate/summary.yaml")))
    val validatedIds = spark.read.text(s"$outRoot/validate/validated_episodes.jsonl")
      .collect().map(r => com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
        .readTree(r.getString(0)).get("episode_index").asLong).toSet
    assert(validatedIds === Set(0L, 1L, 4L))

    // --- global stats doc: pooled reduction over the VALID episodes must
    // equal the flat recompute over the same episodes (exact per-episode
    // stats in the fixture → agreement to float tolerance)
    val statsText = io.SingleFile.readText(spark, s"$outRoot/global_stats.json").get
    val gs = StatsDoc.parse(statsText).get
    val validFiles = Seq(0L, 1L, 4L).map(ep =>
      f"$root/data/chunk-000/episode_$ep%06d.parquet")
    val flat = stages.Stats.computeFromFrames(
      io.Episodes.readRaw(spark, validFiles),
      Seq("action", Schemas.ObsStateStorage))
    gs.features("action").mean.zip(flat.features("action").mean).foreach {
      case (a, b) => assert(math.abs(a - b) < 1e-6, s"pooled vs flat mean: $a vs $b")
    }
    assert(gs.totalFrames === 40L + 35L + 20L)
    assert(gs.episodesUsed === 3L)

    // --- normalized episodes: one file each, dedup/sort applied
    val norm = io.Episodes.readDataDir(spark, s"$outRoot/normalized")
    val counts = norm.groupBy(col(io.Episodes.EpIdxCol).as("ep")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts === expectedFrames)

    // --- materialized dataset: split counts conserve episodes; index rows
    val index = spark.read.parquet(s"$outRoot/dataset/dataset_index.parquet")
    assert(index.count() === 5)
    val splitCounts = index.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splitCounts.values.sum === 5L)
    // every index row's parquet exists with num_rows rows
    index.select("parquet_path", "num_rows", "episode_index").collect().foreach { r =>
      val p = Paths.get(s"$outRoot/dataset/${r.getString(0)}")
      assert(Files.exists(p), s"missing ${r.getString(0)}")
      assert(spark.read.parquet(p.toString).count() === r.getLong(1))
      assert(r.getLong(1) === expectedFrames(r.getLong(2)))
    }
    // videos placed (symlinks) for the episodes that have them
    val placed = index.filter(col("`observation.images.front.path`").isNotNull)
      .select("episode_index").collect().map(_.getLong(0)).toSet
    assert(placed === Set(0L, 1L, 2L, 3L))
  }
}
