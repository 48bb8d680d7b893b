package graft.io

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Schemas

/** Episode-table ingestion (SURVEY §2.1 S1/S13).
  *
  * The whole corpus is ONE DataFrame — `data/chunk-* / episode_*.parquet`
  * read in a single scan with per-file provenance columns — replacing the
  * reference's per-file driver loop (its scalability ceiling,
  * validate_from_manifest_refactored.py:51). At 100 TB this is the only
  * shape that works: the scan parallelizes over files, and every downstream
  * group-by-episode is a single shuffle (or none, since one file = one
  * episode = one input split for the common small-episode case).
  */
object Episodes {

  val SrcFileCol = "_src_file"
  val OrdCol     = "_ord"
  val EpIdxCol   = "_ep_idx_from_name"
  val ChunkCol   = "_chunk_from_path"

  /** Glob episode files under `dataDir` with the reference's flat-dir
    * fallback (align_transform_refactored.py:153-156). Deterministically
    * sorted (W6).
    */
  def listEpisodeFiles(spark: SparkSession, dataDir: String): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new HPath(dataDir)
    val fs = root.getFileSystem(conf)
    def glob(p: String): Seq[String] =
      Option(fs.globStatus(new HPath(p))).map(_.toSeq.map(_.getPath.toString)).getOrElse(Nil)
    val chunked = glob(s"$dataDir/chunk-*/episode_*.parquet")
    val files = if (chunked.nonEmpty) chunked else glob(s"$dataDir/episode_*.parquet")
    files.sorted
  }

  /** Read the given episode files as one DataFrame with provenance columns:
    *  - `_src_file`: source file URI (the grouping key for per-episode ops);
    *  - `_ord`: intra-file row order from the parquet `_metadata.row_index`
    *    metadata column — the row's index within its FILE, not its split,
    *    so keep-first/first/last semantics survive a >maxPartitionBytes
    *    episode file being carved into multiple input splits (a
    *    `monotonically_increasing_id` surrogate would silently reorder
    *    there; SURVEY §7.3 hard part 1);
    *  - `_ep_idx_from_name` / `_chunk_from_path`: parsed from the path (F1).
    */
  def readRaw(spark: SparkSession, files: Seq[String]): DataFrame = {
    require(files.nonEmpty, "no episode files to read")
    spark.read.schema(Schemas.episodeSchema).parquet(files: _*)
      .withColumn(SrcFileCol, input_file_name())
      .withColumn(OrdCol, col("_metadata.row_index"))
      .withColumn(EpIdxCol,
        regexp_extract(input_file_name(), "episode_(\\d+)\\.parquet", 1).try_cast("long"))
      .withColumn(ChunkCol,
        regexp_extract(input_file_name(), "chunk-([^/]+)/", 1))
  }

  def readDataDir(spark: SparkSession, dataDir: String): DataFrame =
    readRaw(spark, listEpisodeFiles(spark, dataDir))
}
