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

  /** Heal the crash window of the replace protocol: if a previous write
    * renamed `target` → `target.bak` but died before renaming the new file
    * in, restore the backup so readers never observe a missing target.
    * Call before READING a file that is maintained read-modify-write
    * (e.g. the streaming manifest fold) — the write path also self-heals.
    */
  def recoverAtomic(spark: SparkSession, target: String): Unit = {
    val tgt = new HPath(target)
    recover(fs(spark, tgt), tgt)
  }

  private def recover(f: FileSystem, tgt: HPath): Unit = {
    val bak = new HPath(tgt.toString + ".bak")
    if (!f.exists(tgt) && f.exists(bak)) f.rename(bak, tgt)
  }

  /** Replace `target` with the single part file staged in `tmp`, never
    * leaving a state where BOTH target and backup are missing: the old
    * version is renamed aside (not deleted) until the new one is in place,
    * so a crash at any step loses at most the in-flight version, which
    * [[recoverAtomic]] / the next write heal. (The previous delete-then-
    * rename protocol had a window where a crash lost the file entirely —
    * fatal for read-modify-write state like the streaming manifest fold,
    * whose checkpoint-replayed batch would then rebuild from empty.)
    */
  private def replaceWith(f: FileSystem, tgt: HPath, part: HPath): Unit = {
    val bak = new HPath(tgt.toString + ".bak")
    if (tgt.getParent != null) f.mkdirs(tgt.getParent)
    recover(f, tgt)
    f.delete(bak, false)
    if (f.exists(tgt)) f.rename(tgt, bak)
    f.rename(part, tgt)
    f.delete(bak, false)
  }

  /** Atomically replace `target` with `df` as a single parquet file. */
  def writeParquetAtomic(df: DataFrame, target: String): Unit = {
    val spark = df.sparkSession
    val tgt = new HPath(target)
    val tmp = new HPath(target + ".tmpdir")
    val f = fs(spark, tgt)
    f.delete(tmp, true)
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val part = f.globStatus(new HPath(tmp, "part-*.parquet")).head.getPath
    replaceWith(f, tgt, part)
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
    if (parts.nonEmpty) replaceWith(f, tgt, parts.head.getPath)
    else {
      val bak = new HPath(target + ".bak")
      if (tgt.getParent != null) f.mkdirs(tgt.getParent)
      f.delete(bak, false)
      f.create(tgt).close() // create() overwrites in place — no delete window
    }
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
