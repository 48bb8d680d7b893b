package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions.col
import graft.core.Status
import graft.stages.Discover
import graft.streaming.DiscoverStream
import graft.FixtureGen._

/** T1 optional streaming mode: discover deltas folded into the manifest by
  * a Trigger.AvailableNow file-source query must reproduce the live tree
  * state (same keys/fingerprints as the batch manifest), retain DELETED
  * tombstones, and be idempotent across re-runs (file-source checkpoint).
  */
class DiscoverStreamSpec extends SparkSuite {

  test("fold of two discover deltas = live tree; tombstones retained; re-run is a no-op") {
    val root = tmpDir("dstream")
    val batchManifest = s"$root/batch_manifest.parquet"
    val deltaDir = s"$root/deltas"
    val foldedManifest = s"$root/folded_manifest.parquet"
    val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(deltaDir))

    // run 1: episodes 0, 1 (both sides present → NEW)
    dataset(spark, root, Map(0L -> cleanFrames(0, 10), 1L -> cleanFrames(1, 12)),
      videosFor = Set(0L, 1L))
    val d1 = Discover.run(spark, root, batchManifest)
    DiscoverStream.writeDelta(d1, deltaDir, seq = 1L)

    // mutate the tree: episode 1 vanishes, episode 2 appears
    Files.delete(Paths.get(s"$root/data/chunk-000/episode_000001.parquet"))
    Seq("observation.images.front", "observation.images.wrist").foreach { cam =>
      Files.deleteIfExists(Paths.get(s"$root/videos/chunk-000/$cam/episode_000001.mp4"))
    }
    dataset(spark, root, Map(2L -> cleanFrames(2, 8)), videosFor = Set(2L))
    val d2 = Discover.run(spark, root, batchManifest)
    DiscoverStream.writeDelta(d2, deltaDir, seq = 2L)

    // drain both deltas (AvailableNow may take them in one or two batches —
    // the merge is associative either way)
    val q = DiscoverStream.fold(spark, deltaDir, foldedManifest, ckpt)
    q.awaitTermination()

    val live = DiscoverStream.liveManifest(spark, foldedManifest)
      .collect().map(r => r.getAs[Long]("episode_index") ->
        (r.getAs[String]("status"), r.getAs[String]("fingerprint"))).toMap
    assert(live.keySet === Set(0L, 2L))
    // episode 0 was UNCHANGED in run 2 → absent from delta 2 → the fold
    // keeps its run-1 row; fingerprint must match the batch manifest's
    val batchFp = spark.read.parquet(batchManifest)
      .filter(col("episode_index") === 0L).head().getAs[String]("fingerprint")
    assert(live(0L)._2 === batchFp)
    assert(live(2L)._1 === Status.New)

    // tombstone retained in the snapshot (not just dropped)
    val ep1 = spark.read.parquet(foldedManifest)
      .filter(col("episode_index") === 1L).collect()
    assert(ep1.length === 1)
    assert(ep1.head.getAs[String]("status") === Status.Deleted)
    assert(ep1.head.getAs[Boolean]("_del"))

    // re-run with nothing pending: checkpoint makes it a no-op
    val before = spark.read.parquet(foldedManifest).collect().toSet
    val q2 = DiscoverStream.fold(spark, deltaDir, foldedManifest, ckpt,
      queryName = "discover_fold_rerun")
    q2.awaitTermination()
    val after = spark.read.parquet(foldedManifest).collect().toSet
    assert(after === before)
  }
}
