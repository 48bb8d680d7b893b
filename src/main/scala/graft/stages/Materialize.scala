package graft.stages

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Hashing
import graft.io.{Episodes, SingleFile}

/** Stage 5 — Materialize (reference steps/materialize_refactored.py:57-154):
  * deterministic hash split into train/val/test, Hive-style
  * `split=<s>/chunk=<c>` layout with one zstd parquet per episode, a
  * dataset index table, a `_manifest.json` bookkeeping doc, and video
  * link/copy placement.
  *
  * Spark shape: split assignment is a column expression over the seeded
  * portable hash (no driver loop); the partitioned layout is ONE
  * partitionBy write job + metadata renames; the index is a small DataFrame
  * aggregation. Video placement (symlink/hardlink/copy/manifest-only,
  * materialize_refactored.py:29-47) runs on the driver for local FS — at
  * scale it would move into foreachPartition, but link semantics are
  * inherently FS-local.
  */
object Materialize {

  final case class Config(
      seed: String = "42",
      train: Double = 0.8,
      validation: Double = 0.1,
      test: Double = 0.1,
      chunkId: String = "000",
      videosRoot: Option[String] = None,
      videoSourceChunkId: String = "000",
      views: Seq[String] = Discover.Cameras,
      linkVideos: String = "symlink") {
    require(math.abs(train + validation + test - 1.0) <= 1e-9,
      "train+val+test must equal 1.0")
  }

  /** The split column for an episode-index column (F4–F6). */
  def splitCol(epIdx: org.apache.spark.sql.Column, cfg: Config): org.apache.spark.sql.Column =
    Hashing.splitAssign(epIdx.cast("string"), cfg.seed, cfg.train, cfg.validation)

  def run(spark: SparkSession, normDir: String, outDir: String,
      cfg: Config = Config()): DataFrame = {
    val files = Episodes.listEpisodeFiles(spark, normDir)
    require(files.nonEmpty, s"No episode_*.parquet found under $normDir")

    // one scan over all normalized episodes; episode identity from filename
    // (materialize_refactored.py:94-97)
    val raw = spark.read.parquet(files: _*)
      .withColumn("_ep_idx",
        regexp_extract(input_file_name(), "episode_(\\d+)\\.parquet", 1).cast("long"))
      .withColumn("_ep_name",
        regexp_extract(input_file_name(), "(episode_\\d+\\.parquet)", 1))

    val stamped = raw
      .withColumn("split", splitCol(col("_ep_idx"), cfg))
      .withColumn("chunk", lit(cfg.chunkId))

    // single partitioned write → split=<s>/chunk=<c>/_ep_name=<n>/part-*,
    // then metadata renames to the exact file-per-episode layout
    val tmp = s"$outDir/.mat_tmp"
    stamped
      .repartition(col("split"), col("_ep_name"))
      .sortWithinPartitions("_ep_name", "frame_index")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("split", "chunk", "_ep_name")
      .option("compression", "zstd")
      .parquet(tmp)

    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new HPath(outDir).getFileSystem(conf)
    val parts = Option(fs.globStatus(new HPath(s"$tmp/split=*/chunk=*/_ep_name=*")))
      .map(_.toSeq).getOrElse(Nil)
    parts.foreach { st =>
      val epName = st.getPath.getName.stripPrefix("_ep_name=")
      val chunkDir = st.getPath.getParent
      val splitDir = chunkDir.getParent
      val target = new HPath(
        s"$outDir/${splitDir.getName}/${chunkDir.getName}/$epName")
      val part = fs.globStatus(new HPath(st.getPath, "part-*.parquet")).head.getPath
      fs.mkdirs(target.getParent)
      fs.delete(target, false)
      fs.rename(part, target)
    }
    fs.delete(new HPath(tmp), true)

    // dataset index (A13-A14): one row per episode with paths + row counts.
    // `split`/`chunk` were consumed by partitionBy, so recompute split from
    // the same deterministic hash — identical by construction.
    val index = raw.groupBy(col("_ep_idx").as("episode_index"), col("_ep_name"))
      .agg(count(lit(1)).as("num_rows"))
      .withColumn("split", splitCol(col("episode_index"), cfg))
      .withColumn("chunk", lit(cfg.chunkId))
      .withColumn("parquet_path",
        concat(lit("split="), col("split"), lit(s"/chunk=${cfg.chunkId}/"), col("_ep_name")))

    // video placement (S18) + per-view index paths
    val withVideos = placeVideos(spark, index, outDir, cfg)
      .drop("_ep_name")
      .orderBy("episode_index")
      .cache()

    SingleFile.writeParquetAtomic(withVideos, s"$outDir/dataset_index.parquet")

    val counts = withVideos.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val manifest =
      s"""{
         |  "source_parquet": ${q(normDir)},
         |  "source_videos": ${cfg.videosRoot.map(q).getOrElse("null")},
         |  "output": ${q(outDir)},
         |  "seed": ${q(cfg.seed)},
         |  "fractions": {"train": ${cfg.train}, "val": ${cfg.validation}, "test": ${cfg.test}},
         |  "counts": {"train": ${counts.getOrElse("train", 0L)}, "val": ${counts.getOrElse("val", 0L)}, "test": ${counts.getOrElse("test", 0L)}},
         |  "chunk": ${q(cfg.chunkId)},
         |  "views": ${cfg.views.map(q).mkString("[", ", ", "]")},
         |  "link_videos": ${q(cfg.linkVideos)}
         |}""".stripMargin
    SingleFile.writeText(spark, s"$outDir/_manifest.json", manifest)

    withVideos
  }

  private def q(s: String): String = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** Link/copy source videos into the layout; adds `<view>.path` columns.
    * All four reference modes (symlink relative / hardlink / copy /
    * manifest-only).
    */
  private def placeVideos(spark: SparkSession, index: DataFrame, outDir: String,
      cfg: Config): DataFrame = {
    import java.nio.file.{Files, Paths}
    val rows = index.collect()
    val outCols = cfg.views.map { view =>
      val paths: Map[Long, String] = cfg.videosRoot match {
        case None => Map.empty
        case Some(vroot) =>
          rows.iterator.flatMap { r =>
            val ep = r.getAs[Long]("episode_index")
            val split = r.getAs[String]("split")
            val srcP = Paths.get(vroot, s"chunk-${cfg.videoSourceChunkId}", view,
              f"episode_$ep%06d.mp4")
            if (!Files.exists(srcP)) None
            else {
              val relPath = s"split=$split/chunk=${cfg.chunkId}/videos/$view/" +
                f"episode_$ep%06d.mp4"
              val dstP = Paths.get(outDir.stripPrefix("file:"), s"split=$split",
                s"chunk=${cfg.chunkId}", "videos", view, f"episode_$ep%06d.mp4")
              if (cfg.linkVideos != "manifest-only") {
                Files.createDirectories(dstP.getParent)
                Files.deleteIfExists(dstP)
                cfg.linkVideos match {
                  case "symlink" =>
                    Files.createSymbolicLink(dstP, dstP.getParent.relativize(srcP.toAbsolutePath))
                  case "hardlink" => Files.createLink(dstP, srcP)
                  case "copy" => Files.copy(srcP, dstP)
                  case other => throw new IllegalArgumentException(s"Unknown link method: $other")
                }
              }
              Some(ep -> relPath)
            }
          }.toMap
      }
      view -> paths
    }
    // attach as literal map lookups (small: one row per episode)
    import spark.implicits._
    var df = index
    outCols.foreach { case (view, paths) =>
      val mapping = if (paths.isEmpty) typedLit(Map.empty[Long, String]) else typedLit(paths)
      df = df.withColumn(s"$view.path".replace(".", "_") + "_tmp", mapping(col("episode_index")))
        .withColumnRenamed(s"$view.path".replace(".", "_") + "_tmp", s"$view.path")
    }
    df
  }
}
