package graft.io

import java.nio.file.{Files, Path}

/** Scratch-directory lifecycle for gates that need a local staging area
  * (bucketed-table warehouses, streaming checkpoints, MERGE targets).
  * Repeated or concurrent gate runs in one long-lived session must not
  * accumulate disk — every temp dir is deleted in the caller's `finally`
  * (after the gate's results are materialized, since the returned frames
  * are otherwise lazy readers over the dir being deleted).
  */
object TempDirs {

  def create(prefix: String): Path = Files.createTempDirectory(prefix)

  /** Best-effort recursive delete; never throws (a half-deleted scratch
    * dir must not fail a gate whose results are already pinned).
    */
  def deleteRecursively(dir: Path): Unit = {
    try {
      if (Files.exists(dir)) {
        import scala.jdk.CollectionConverters._
        Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(p => try Files.deleteIfExists(p) catch { case _: Exception => () })
      }
    } catch { case _: Exception => () }
  }

  def deleteRecursively(dir: String): Unit =
    deleteRecursively(java.nio.file.Paths.get(dir))

  /** Run `body` with a fresh temp dir, deleting it afterwards. The body
    * must return MATERIALIZED data (collected rows or a localCheckpoint),
    * never a lazy plan over files inside the dir.
    */
  def withTempDir[A](prefix: String)(body: Path => A): A = {
    val dir = create(prefix)
    try body(dir) finally deleteRecursively(dir)
  }
}
