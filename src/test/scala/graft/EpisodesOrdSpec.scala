package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.core.Schemas
import graft.io.Episodes
import graft.stages.AlignTransform

/** The `_ord` intra-file ordering contract (A2/A4/W2) must survive an
  * episode file that spans MULTIPLE row groups and MULTIPLE input splits —
  * the >maxPartitionBytes case a 100 TB corpus will hit. `_ord` comes from
  * the parquet `_metadata.row_index` (a per-FILE coordinate), so split
  * carving must not change keep-first winners.
  */
class EpisodesOrdSpec extends SparkSuite {
  import FixtureGen._

  /** Write one episode parquet with tiny row groups so the scan can split it. */
  private def writeMultiRowGroup(frames: Seq[core.Models.Frame], path: String): Unit = {
    val tmp = path + ".tmpdir"
    val ordered = spark.createDataFrame(
      spark.sparkContext.parallelize(frames.map(f => org.apache.spark.sql.Row(
        f.action, f.observation_state, f.timestamp, f.frame_index,
        f.episode_index, f.index, f.task_index)), 1),
      Schemas.episodeSchema)
    ordered.write
      .option("parquet.block.size", "4096")
      .option("parquet.page.size", "1024")
      .mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).head
    Files.createDirectories(Paths.get(path).getParent)
    Files.move(Paths.get(part), Paths.get(path),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // best-effort tmpdir cleanup
    Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
  }

  test("_ord is the in-file row index even when the file splits into many input partitions") {
    val root = tmpDir("ord_multi")
    val n = 2000
    // rows written in a known shuffled-but-deterministic order: timestamp
    // encodes the file position so we can assert _ord against it
    val frames = (0 until n).map { i =>
      cleanFrames(0, 1).head.copy(timestamp = i.toDouble, frame_index = (i % 50).toLong,
        index = i.toLong)
    }
    val file = s"$root/data/chunk-000/episode_000000.parquet"
    writeMultiRowGroup(frames, file)

    val conf = spark.conf
    val prev = conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    try {
      conf.set("spark.sql.files.maxPartitionBytes", "8192") // force many splits
      val raw = Episodes.readDataDir(spark, s"$root/data")
      val nSplits = raw.rdd.getNumPartitions
      assert(nSplits > 1, s"fixture must split (got $nSplits partition)")
      // _ord == written file position (encoded in timestamp), for every row
      val mismatches = raw.filter(col(Episodes.OrdCol) =!= col("timestamp").cast("long")).count()
      assert(mismatches === 0L)

      // keep-first winner per frame_index must be the SMALLEST file position
      val winners = AlignTransform.transformFrames(raw, None, normalize = false)
        .select(col("frame_index"), col("timestamp")).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // first occurrence of frame_index k in file order is at position k
      (0 until 50).foreach { k =>
        assert(winners(k.toLong) === k.toDouble,
          s"keep-first winner for frame $k moved under split carving")
      }
    } finally conf.set("spark.sql.files.maxPartitionBytes", prev)
  }
}
