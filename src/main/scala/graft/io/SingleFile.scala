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
    * in, restore the backup so the target is never observed missing.
    *
    * WRITER-SIDE ONLY (single-writer contract): call from the component
    * that OWNS the file's read-modify-write cycle (the streaming manifest
    * fold, batch discover) before reading its own state back. A pure
    * READER must not call this — a reader resurrecting the backup races
    * an in-flight replace (between its two renames) and can make the
    * writer's rename-in fail; readers use [[readablePath]] instead, which
    * never mutates the filesystem.
    */
  def recoverAtomic(spark: SparkSession, target: String): Unit = {
    val tgt = new HPath(target)
    recover(fs(spark, tgt), tgt)
  }

  /** Read-only crash-window fallback for PURE READERS: the target path if
    * it exists, else the backup left by an interrupted replace. Never
    * mutates the filesystem (see [[recoverAtomic]] for why readers must
    * not heal).
    */
  def readablePath(spark: SparkSession, target: String): String = {
    val tgt = new HPath(target)
    val f = fs(spark, tgt)
    if (!f.exists(tgt) && f.exists(new HPath(target + ".bak"))) target + ".bak"
    else target
  }

  /** Hadoop `FileSystem.rename` reports most failures by RETURNING FALSE
    * (src vanished, dst exists, transient error) — an unchecked rename in
    * this protocol can silently destroy the only surviving copy. Every
    * rename goes through this guard.
    */
  private def renameOrThrow(f: FileSystem, src: HPath, dst: HPath): Unit =
    if (!f.rename(src, dst))
      throw new java.io.IOException(s"rename failed: $src -> $dst")

  private def recover(f: FileSystem, tgt: HPath): Unit = {
    val bak = new HPath(tgt.toString + ".bak")
    if (!f.exists(tgt) && f.exists(bak)) renameOrThrow(f, bak, tgt)
  }

  /** Replace `target` with the single part file staged in `tmp`, never
    * leaving a state where BOTH target and backup are missing: the old
    * version is renamed aside (not deleted) until the new one is in place,
    * so a crash at any step loses at most the in-flight version, which
    * [[recoverAtomic]] / the next write heal. (The previous delete-then-
    * rename protocol had a window where a crash lost the file entirely —
    * fatal for read-modify-write state like the streaming manifest fold,
    * whose checkpoint-replayed batch would then rebuild from empty.)
    * A failed rename of the new file in restores the backup before
    * throwing, so the caller observes the old version, not a hole.
    */
  private def replaceWith(f: FileSystem, tgt: HPath, part: HPath): Unit = {
    val bak = new HPath(tgt.toString + ".bak")
    if (tgt.getParent != null) f.mkdirs(tgt.getParent)
    recover(f, tgt)
    f.delete(bak, false)
    val hadOld = f.exists(tgt)
    if (hadOld) renameOrThrow(f, tgt, bak)
    try renameOrThrow(f, part, tgt)
    catch {
      case e: java.io.IOException =>
        if (hadOld) recover(f, tgt) // put the old version back before failing
        throw e
    }
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
      recover(f, tgt) // a crashed prior replace may have left only the backup
      f.create(tgt).close() // create() overwrites in place — no delete window
      f.delete(bak, false) // only after the new target exists
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
