package graft

import org.apache.spark.sql.functions._
import graft.ops.Probe
import graft.stages.Validate

/** Video-probe operator tests: fraction parsing, graceful degrade, and the
  * validate stage's video-check integration (no ffmpeg in this container →
  * every probe degrades to `*_video_missing`, the reference's None path).
  */
class ProbeSpec extends SparkSuite {
  import FixtureGen._

  test("fps fraction parsing with zero-denominator guard") {
    assert(Probe.rateToDouble("30000/1001").exists(f => math.abs(f - 29.97) < 0.01))
    assert(Probe.rateToDouble("30/1").contains(30.0))
    assert(Probe.rateToDouble("30/0").contains(30.0)) // denom 0 → 1
    assert(Probe.rateToDouble("banana") === None)
    assert(Probe.rateToDouble(null) === None)
    assert(Probe.rateToDouble("1/a") === None)
  }

  test("ffprobe on a fake file returns None (graceful degrade)") {
    val f = java.nio.file.Files.createTempFile("fake", ".mp4")
    java.nio.file.Files.write(f, "not a video".getBytes)
    assert(Probe.ffprobe(f.toString) === None)
    assert(Probe.ffprobe("/nonexistent/file.mp4") === None)
  }

  test("validate with video checks flags missing/unreadable videos") {
    val root = tmpDir("probe_fix")
    dataset(spark, root, Map(0L -> cleanFrames(0, 10)),
      videosFor = Set(0L), metaLengths = Map(0L -> 10L))
    val manifest = s"$root/m.parquet"
    graft.stages.Discover.run(spark, root, manifest)
    val out = tmpDir("probe_out")
    val (total, ok, fail) = Validate.run(spark, manifest, s"$root/meta", out,
      Validate.Config(skipVideo = false))
    assert(total === 1 && ok === 0 && fail === 1)
    val issues = spark.read.parquet(s"$out/episodes.parquet")
      .select(explode(col("issues.kind"))).collect().map(_.getString(0)).toSet
    // fake mp4 bytes are unreadable by any probe → both cameras degrade to
    // the missing-video issue; table checks all pass
    assert(issues === Set("front_video_missing", "wrist_video_missing"))
  }
}
