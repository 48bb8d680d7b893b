package graft.io

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Single-file and atomic-write helpers.
  *
  * Spark's committers produce directories of part files; the reference's
  * stage contracts are *named single files* updated atomically
  * (write-to-tmp + rename, reference discover_refactored.py:23-27). These
  * helpers bridge the two: write a 1-partition dataset to a tmp dir, then
  * rename the part file into place. Rename is a metadata operation on
  * HDFS-like filesystems, so this stays cheap at any scale; the coalesce(1)
  * is only ever applied to *small* control-plane outputs (manifests,
  * summaries), never to data-plane tables.
  */
object SingleFile {

  private def fs(spark: SparkSession, p: HPath): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Atomically replace `target` with `df` as a single parquet file. */
  def writeParquetAtomic(df: DataFrame, target: String): Unit = {
    val spark = df.sparkSession
    val tgt = new HPath(target)
    val tmp = new HPath(target + ".tmpdir")
    val f = fs(spark, tgt)
    f.delete(tmp, true)
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val part = f.globStatus(new HPath(tmp, "part-*.parquet")).head.getPath
    f.delete(tgt, false)
    if (tgt.getParent != null) f.mkdirs(tgt.getParent)
    f.rename(part, tgt)
    f.delete(tmp, true)
  }

  /** Write `df` as a single JSONL file at `target`. */
  def writeJsonl(df: DataFrame, target: String): Unit = {
    val spark = df.sparkSession
    val tgt = new HPath(target)
    val tmp = new HPath(target + ".tmpdir")
    val f = fs(spark, tgt)
    f.delete(tmp, true)
    df.coalesce(1).write.mode(SaveMode.Overwrite).json(tmp.toString)
    // an empty DataFrame yields no part file — emit a zero-byte file then
    val parts = f.globStatus(new HPath(tmp, "part-*"))
    f.delete(tgt, false)
    if (tgt.getParent != null) f.mkdirs(tgt.getParent)
    if (parts.nonEmpty) f.rename(parts.head.getPath, tgt)
    else f.create(tgt).close()
    f.delete(tmp, true)
  }

  /** Driver-side small text write (summary.yaml, *.json docs). */
  def writeText(spark: SparkSession, target: String, text: String): Unit = {
    val tgt = new HPath(target)
    val f = fs(spark, tgt)
    if (tgt.getParent != null) f.mkdirs(tgt.getParent)
    val out = f.create(tgt, true)
    out.write(text.getBytes("UTF-8"))
    out.close()
  }

  def readText(spark: SparkSession, target: String): Option[String] = {
    val tgt = new HPath(target)
    val f = fs(spark, tgt)
    if (!f.exists(tgt)) None
    else {
      val in = f.open(tgt)
      try {
        val bytes = org.apache.commons.io.IOUtils.toByteArray(in)
        Some(new String(bytes, "UTF-8"))
      } finally in.close()
    }
  }
}
