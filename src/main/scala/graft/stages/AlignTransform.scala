package graft.stages

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{GlobalStats, Schemas, StatsDoc}
import graft.io.{Episodes, SingleFile}

/** Stage 4 — Align & Transform (reference
  * steps/align_transform_refactored.py:82-160).
  *
  * Per episode: select required columns → rename dotted obs column → cast to
  * stable types → enforce vector width → sort by frame_index → dedup frames
  * keep-first → reindex 0..N-1 → drop null/NaN key scalars → optional
  * z-score normalization vs global stats → rename back.
  *
  * Spark-first: ONE job over every episode at once. Per-episode ordering is
  * a window partitioned by source file (no global sort); normalization is
  * built-in higher-order `transform` with broadcast stat literals — the
  * reference's only row-level UDF (align_transform:71-78) disappears into
  * whole-stage codegen. At 100 TB: no shuffle is needed at all when one
  * file = one input split (window partition == scan partition); otherwise
  * one hash shuffle on `_src_file`.
  */
object AlignTransform {

  import Schemas._

  /** Core transform on a raw episode frame (from [[Episodes.readRaw]] —
    * requires the provenance columns). Keeps `_src_file` for the writer.
    */
  def transformFrames(raw: DataFrame, stats: Option[GlobalStats], normalize: Boolean = true): DataFrame = {
    val src = col(Episodes.SrcFileCol)
    val ord = col(Episodes.OrdCol)

    // select + rename dotted → safe (P1, P2)
    var df = raw.select(
      (RequiredEpisodeCols.map(c => col(s"`$c`")) :+ src :+ ord): _*)
      .withColumnRenamed(ObsStateStorage, ObsStateSafe)

    // casts (P3)
    df = df
      .withColumn("timestamp", col("timestamp").cast("double"))
      .withColumn("frame_index", col("frame_index").cast("long"))
      .withColumn("episode_index", col("episode_index").cast("long"))
      .withColumn("index", col("index").cast("long"))
      .withColumn("task_index", col("task_index").cast("long"))
      .withColumn("action", col("action").cast(PermissiveFloatVec))
      .withColumn(ObsStateSafe, col(ObsStateSafe).cast(PermissiveFloatVec))

    // width filter (P4)
    df = df.filter(size(col("action")) === ListWidth && size(col(ObsStateSafe)) === ListWidth)

    // sort + dedup keep-first + reindex (W1-W3). Polars' stable sort keeps
    // file order among equal frame_index; `_ord` reproduces that exactly.
    val wDedup = Window.partitionBy(src, col("frame_index")).orderBy(ord)
    val wReindex = Window.partitionBy(src).orderBy(col("frame_index"), ord)
    df = df
      .withColumn("_rn", row_number().over(wDedup))
      .filter(col("_rn") === 1)
      .drop("_rn")
      .withColumn("frame_index", row_number().over(wReindex).cast("long") - 1)

    // null/NaN drop AFTER reindex — mirrors the reference ordering, which
    // can leave gaps in frame_index when dirty rows are dropped here (P5).
    df = df.filter(
      col("timestamp").isNotNull && !isnan(col("timestamp")) &&
        col("frame_index").isNotNull && col("episode_index").isNotNull)

    // z-score normalize with broadcast literal stats (F11); silently skip
    // when stats are absent/malformed/wrong width.
    if (normalize) stats.foreach { gs =>
      def normCol(name: String, featureKey: String): Unit = {
        gs.features.get(featureKey).foreach { f =>
          if (f.mean.size == ListWidth && f.std.size == ListWidth) {
            df = df.withColumn(name, normalizeVec(col(name), f.mean, f.std))
          }
        }
      }
      normCol("action", "action")
      normCol(ObsStateSafe, ObsStateStorage)
    }

    df.withColumnRenamed(ObsStateSafe, ObsStateStorage)
  }

  /** `(v[i] - mean[i]) / (std[i] != 0 ? std[i] : 1)` elementwise, fully
    * codegen'd: zip_with against array literals, no UDF.
    */
  def normalizeVec(v: Column, mean: Seq[Double], std: Seq[Double]): Column = {
    val m = typedLit(mean)
    val s = typedLit(std.map(x => if (x != 0.0) x else 1.0))
    zip_with(zip_with(v.cast(ArrayDouble), m, (x, mu) => x - mu), s, (x, sd) => x / sd)
      .cast(PermissiveFloatVec)
  }

  // cast targets must keep containsNull=true: Spark refuses a narrowing
  // array cast even when no element is null
  private val ArrayDouble = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.DoubleType)
  private val PermissiveFloatVec = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.FloatType)

  /** Full stage: read raw episodes under `dataDir`, transform, write one
    * parquet per episode into `outDir` (file-per-episode contract,
    * SURVEY §7.3 hard part 3): a single partitioned write job + a
    * metadata-only rename pass.
    */
  def run(spark: SparkSession, dataDir: String, outDir: String,
      statsPath: Option[String], normalize: Boolean = true): Seq[String] = {
    val stats = statsPath.flatMap(p => SingleFile.readText(spark, p)).flatMap(StatsDoc.parse)
    val files = Episodes.listEpisodeFiles(spark, dataDir)
    if (files.isEmpty) return Nil
    val raw = Episodes.readRaw(spark, files)
    val out = transformFrames(raw, stats, normalize)
      .withColumn("_ep_name",
        regexp_extract(col(Episodes.SrcFileCol), "(episode_\\d+\\.parquet)", 1))
      .drop(Episodes.SrcFileCol, Episodes.OrdCol, Episodes.EpIdxCol, Episodes.ChunkCol)
    val written = writePerEpisode(spark, out, outDir)
    // Episodes whose rows were ALL filtered still get an (empty) output
    // file — the reference writes one parquet per input unconditionally
    // (align_transform_refactored.py:158-160).
    val writtenNames = written.map(_.split("/").last).toSet
    val emptyOnes = files.map(_.split("/").last).filterNot(writtenNames)
    if (emptyOnes.nonEmpty) {
      val emptySchema = org.apache.spark.sql.types.StructType(
        Schemas.episodeSchema.fields)
      // repartition(1): a 0-partition empty frame writes no part file at all
      val emptyDf = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], emptySchema)
        .repartition(1)
      emptyOnes.foreach(n => SingleFile.writeParquetAtomic(emptyDf, s"$outDir/$n"))
    }
    (written ++ emptyOnes.map(n => s"$outDir/$n")).sorted
  }

  /** Write one parquet file per `_ep_name` value: partitioned write, then
    * rename `part-*` → `<outDir>/<episode name>`. Rename count = #episodes
    * (metadata ops only); the data move is one distributed job.
    */
  def writePerEpisode(spark: SparkSession, df: DataFrame, outDir: String): Seq[String] = {
    val tmp = s"$outDir/.stage_tmp"
    df.repartition(col("_ep_name"))
      .sortWithinPartitions("_ep_name", "frame_index")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("_ep_name")
      .option("compression", "zstd")
      .parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new HPath(outDir).getFileSystem(conf)
    val dirs = Option(fs.globStatus(new HPath(s"$tmp/_ep_name=*"))).map(_.toSeq).getOrElse(Nil)
    val written = graft.io.ParallelFs.mapParallel(dirs) { st =>
      val name = st.getPath.getName.stripPrefix("_ep_name=")
      val part = fs.globStatus(new HPath(st.getPath, "part-*.parquet")).head.getPath
      val target = new HPath(s"$outDir/$name")
      fs.delete(target, false)
      fs.rename(part, target)
      target.toString
    }
    fs.delete(new HPath(tmp), true)
    written.sorted
  }
}
