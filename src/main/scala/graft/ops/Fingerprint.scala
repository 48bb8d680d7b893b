package graft.ops

import java.security.MessageDigest
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** File fingerprinting (SURVEY §2.1 S14–S16; reference fp/fingerprint.py).
  *
  * Executor-side code: runs inside `mapPartitions` over a file-listing
  * Dataset, so fingerprinting 10M files is an embarrassingly parallel scan.
  * The cost bound per file is 2×64 KiB ranged reads + sha256 (reference
  * constants SAMPLE_BYTES=65536), independent of file size, unless
  * `fullHash` is requested.
  */
object Fingerprint {

  val SampleBytes = 65536
  val StabilityMinBytes: Long = 50L * 1024 * 1024
  val StabilityPauseMs = 150L
  val Algo = "size+mtime+sha(head|tail)-v1"

  final case class Part(size: Long, mtimeNs: Long, sha: String)

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  /** stat + sampled (head|tail) sha256 (fingerprint.py:20-35). */
  def quickFingerprint(fs: FileSystem, p: HPath, fullHash: Boolean = false): Part = {
    val st = fs.getFileStatus(p)
    val size = st.getLen
    val mtimeNs = st.getModificationTime * 1000000L
    val md = MessageDigest.getInstance("SHA-256")
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](SampleBytes)
      if (fullHash) {
        val big = new Array[Byte](1024 * 1024)
        var n = in.read(big)
        while (n > 0) { md.update(big, 0, n); n = in.read(big) }
      } else {
        val headN = in.read(buf, 0, SampleBytes)
        if (headN > 0) md.update(buf, 0, headN)
        if (size > SampleBytes) {
          in.seek(math.max(0L, size - SampleBytes))
          var read = 0
          var n = in.read(buf, read, SampleBytes - read)
          while (n > 0 && read + n < SampleBytes) { read += n; n = in.read(buf, read, SampleBytes - read) }
          if (n > 0) read += n
          if (read > 0) md.update(buf, 0, read)
        }
      }
    } finally in.close()
    Part(size, mtimeNs, hex(md.digest()))
  }

  /** Write-stability probe (fingerprint.py:6-18): stat, pause, re-stat; only
    * files ≥ 50 MiB pay the pause. Detects in-flight writes → PENDING (T2).
    */
  def stableCheck(fs: FileSystem, p: HPath,
      minBytes: Long = StabilityMinBytes, pauseMs: Long = StabilityPauseMs): Boolean = {
    val st1 = try fs.getFileStatus(p) catch { case _: java.io.FileNotFoundException => return false }
    if (st1.getLen < minBytes) return true
    Thread.sleep(pauseMs)
    val st2 = try fs.getFileStatus(p) catch { case _: java.io.FileNotFoundException => return false }
    st1.getLen == st2.getLen && st1.getModificationTime == st2.getModificationTime
  }

  /** Combine per-file parts into one episode fingerprint: sha256 over a
    * canonical sorted-key JSON encoding (fingerprint.py:37-38). Determinism,
    * not byte-parity with the reference, is the contract.
    */
  def combine(parts: Map[String, Part]): String = {
    val canonical = parts.toSeq.sortBy(_._1).map { case (k, p) =>
      s""""$k":{"mtime_ns":${p.mtimeNs},"sha":"${p.sha}","size":${p.size}}"""
    }.mkString("{", ",", "}")
    val md = MessageDigest.getInstance("SHA-256")
    hex(md.digest(canonical.getBytes("UTF-8")))
  }
}
