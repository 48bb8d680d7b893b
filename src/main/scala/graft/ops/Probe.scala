package graft.ops

import scala.sys.process._
import scala.util.Try

/** Video metadata probe (SURVEY §2.1 S17; reference validate_one.py:18-46):
  * shell out to ffprobe for stream metadata, returning None on ANY failure
  * (missing binary, unreadable file, bad json) exactly like the reference's
  * bare `except: return None`.
  *
  * Runs inside `mapPartitions` over a video-path Dataset — one subprocess
  * per file, bounded by partition sizing; executors need a media image with
  * ffmpeg installed (reference Dockerfile.media), and WITHOUT it every
  * probe degrades to None → the `*_video_missing`-style issues downstream,
  * never a crash.
  */
object Probe {

  final case class VideoMeta(
      nbFrames: Option[Long],
      rFps: Option[Double],
      avgFps: Option[Double],
      duration: Option[Double])

  /** `"30000/1001"` → 29.97…; zero denominator → denominator 1 (F10,
    * reference `_rate_to_float`).
    */
  def rateToDouble(rate: String): Option[Double] = {
    if (rate == null || !rate.contains("/")) return None
    val parts = rate.split("/")
    Try {
      val n = parts(0).toDouble
      val d0 = parts(1).toDouble
      val d = if (d0 != 0) d0 else 1.0
      n / d
    }.toOption
  }

  private val FfprobeArgs = Seq("-v", "error", "-select_streams", "v:0",
    "-show_entries", "stream=nb_frames,r_frame_rate,avg_frame_rate,duration",
    "-of", "json")

  /** Parse ffprobe's `-of json` output; None on unparseable/empty JSON. */
  private def parseMeta(out: String): Option[VideoMeta] = Try {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(out)
    val streams = root.get("streams")
    val s = if (streams != null && streams.size() > 0) streams.get(0)
      else mapper.createObjectNode()
    def str(k: String): Option[String] =
      Option(s.get(k)).filter(n => !n.isNull).map(_.asText).filter(_.nonEmpty)
    VideoMeta(
      nbFrames = str("nb_frames").flatMap(v => Try(v.toLong).toOption),
      rFps = str("r_frame_rate").flatMap(rateToDouble),
      avgFps = str("avg_frame_rate").flatMap(rateToDouble),
      duration = str("duration").flatMap(v => Try(v.toDouble).toOption))
  }.toOption

  /** Probe one video file with a fresh subprocess; None on any failure. */
  def ffprobe(path: String): Option[VideoMeta] = Try {
    (Seq("ffprobe") ++ FfprobeArgs ++ Seq(path)).!!
  }.toOption.flatMap(parseMeta)

  /** Per-PARTITION persistent probe worker (round-10 verdict #3): the
    * measured 21 ms/probe of the fan-out is JVM ProcessBuilder spawn cost,
    * not ffprobe work, so a partition probing thousands of files pays it
    * thousands of times. This keeps the ONE-PROBE-PER-FILE contract (the
    * reference's semantic — each file still gets its own ffprobe
    * invocation with its own exit status) but amortizes the JVM-side
    * spawn: ONE `/bin/sh` loop per partition reads paths on stdin, runs
    * ffprobe per path (an in-shell fork, ~10× cheaper than a JVM spawn),
    * and frames each result with an exit-status sentinel line.
    *
    * Failure semantics unchanged from [[ffprobe]]: missing binary,
    * unreadable file, bad JSON → None for THAT file, never a crash. A
    * path the line protocol cannot carry (embedded newline/CR) and any
    * worker-pipe breakage fall back to the one-shot [[ffprobe]], so the
    * worker is a pure fast path. Callers in `mapPartitions` should
    * `close()` via a TaskContext completion listener ([[Validate]]).
    */
  final class Worker(extraPathDir: Option[String] = None) {
    private val Sentinel = "__GRAFT_PROBE_DONE__"
    private var proc: java.lang.Process = null
    private var toWorker: java.io.BufferedWriter = null
    private var fromWorker: java.io.BufferedReader = null
    private var dead = false

    private def ensureStarted(): Boolean = {
      if (proc != null && proc.isAlive) return true
      if (dead) return false
      Try {
        val script = "while IFS= read -r p; do " +
          s"ffprobe ${FfprobeArgs.mkString(" ")} \"$$p\" 2>/dev/null; " +
          s"printf '\\n$Sentinel %s\\n' \"$$?\"; done"
        val pb = new java.lang.ProcessBuilder("/bin/sh", "-c", script)
        // never read worker stderr — discard it so a chatty ffprobe can't
        // fill the pipe buffer and deadlock the loop
        pb.redirectError(java.lang.ProcessBuilder.Redirect.DISCARD)
        // test seam: lets a spec point the worker at a stub ffprobe and
        // exercise the full line protocol in a codec-less container
        extraPathDir.foreach { d =>
          pb.environment().put("PATH",
            d + ":" + Option(System.getenv("PATH")).getOrElse(""))
        }
        proc = pb.start()
        toWorker = new java.io.BufferedWriter(
          new java.io.OutputStreamWriter(proc.getOutputStream, "UTF-8"))
        fromWorker = new java.io.BufferedReader(
          new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))
        true
      }.getOrElse { dead = true; false }
    }

    /** Probe one file; semantics identical to [[ffprobe]]. */
    def probe(path: String): Option[VideoMeta] = {
      if (path == null) return None
      if (path.indexOf('\n') >= 0 || path.indexOf('\r') >= 0 ||
          !ensureStarted()) return ffprobe(path)
      val attempt = Try {
        toWorker.write(path); toWorker.newLine(); toWorker.flush()
        val sb = new StringBuilder
        var exit: Option[String] = None
        while (exit.isEmpty) {
          val line = fromWorker.readLine()
          if (line == null) throw new java.io.EOFException("probe worker died")
          if (line.startsWith(Sentinel))
            exit = Some(line.substring(Sentinel.length).trim)
          else { sb.append(line); sb.append('\n') }
        }
        if (exit.contains("0")) parseMeta(sb.toString) else None
      }
      attempt.getOrElse {
        // pipe broken mid-probe: this worker is unusable (frames could be
        // misaligned) — kill it and degrade to one-shot for the rest
        close(); dead = true
        ffprobe(path)
      }
    }

    def close(): Unit = {
      Try(if (toWorker != null) toWorker.close())
      Try(if (proc != null) proc.destroy())
      proc = null; toWorker = null; fromWorker = null
    }
  }

  /** Effective fps for validation: avg_fps falling back to r_fps
    * (validate_one.py:131).
    */
  def effectiveFps(m: VideoMeta): Option[Double] = m.avgFps.orElse(m.rFps)
}
