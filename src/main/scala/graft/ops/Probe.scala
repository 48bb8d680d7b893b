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

  /** Probe one video file; None on any failure. */
  def ffprobe(path: String): Option[VideoMeta] = Try {
    val out = Seq("ffprobe", "-v", "error", "-select_streams", "v:0",
      "-show_entries", "stream=nb_frames,r_frame_rate,avg_frame_rate,duration",
      "-of", "json", path).!!
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

  /** Effective fps for validation: avg_fps falling back to r_fps
    * (validate_one.py:131).
    */
  def effectiveFps(m: VideoMeta): Option[Double] = m.avgFps.orElse(m.rFps)
}
