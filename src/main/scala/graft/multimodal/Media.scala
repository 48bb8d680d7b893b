package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: media (image/audio/video) as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators.
  *
  * Spark-side plumbing is REAL — schema, partition-friendly batch shape,
  * `binaryFile` ingestion, mapPartitions decode fan-out — while the actual
  * codec call is stubbed behind [[MediaCodec]] (this container ships no
  * image/audio libraries; the stub is a deterministic fake so the plumbing
  * is testable end to end, matching how the reference treats videos as
  * out-of-band objects probed by ffprobe, validate_one.py:18-46).
  *
  * At 100 TB: media bytes stay columnar in parquet (or out-of-band as URIs
  * + `binaryFile` reads); decode runs inside executors with per-partition
  * batching; metadata-only queries never touch the bytes column thanks to
  * parquet column pruning.
  */
object Media {

  /** Typed metadata carried next to the opaque bytes. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("duration_s", DoubleType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("uri", StringType),
    StructField("bytes", BinaryType),
    StructField("meta", mediaMetaSchema)))

  /** Ingest a directory of opaque media files as a media table
    * (`binaryFile` source: path, modificationTime, length, content).
    */
  def readBinaryDir(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        xxhash64(col("path")).as("media_id"),
        col("path").as("uri"),
        col("content").as("bytes"),
        lit(null).cast(mediaMetaSchema).as("meta"))

  /** Derive a deterministic synthetic media table from `documents` — fake
    * "image" bytes from the text hash — so the full pipeline is exercisable
    * without codecs. 256 bytes per doc, byte i = sha-derived.
    */
  def syntheticMediaFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      concat(lit("synthetic://"), col("doc_id")).as("uri"),
      unhex(concat((0 until 8).map(i => md5(concat_ws(":", lit(i.toString), col("text")))): _*))
        .as("bytes"),
      struct(
        lit("fake").as("format"),
        (pmod(col("doc_id"), lit(64)) + 16).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) + 12).cast("int").as("height"),
        lit(1).cast("int").as("n_frames"),
        lit(0.0).as("duration_s")).as("meta"))

  final case class DecodedFrame(
      media_id: Long,
      frame_idx: Int,
      width: Int,
      height: Int,
      pixels: Array[Float])

  /** Decode each media blob into frame feature vectors via mapPartitions —
    * the executor-side batch shape a real codec integration would use
    * (one codec context per partition, streamed rows).
    */
  def decodeFrames(spark: SparkSession, media: DataFrame): Dataset[DecodedFrame] = {
    import spark.implicits._
    media.select("media_id", "bytes", "meta.width", "meta.height")
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { it =>
        // A real integration would initialize the codec ONCE here.
        it.map { case (id, bytes, w, h) =>
          DecodedFrame(id, 0, w, h, MediaCodec.decodeToFeatures(bytes, w, h))
        }
      }
  }

  /** Resize decoded feature vectors to a target length by averaging
    * fixed-width bins (the deterministic stand-in for an image resample —
    * a real codec would do pixel-space interpolation at this exact seam).
    */
  def resizeFeatures(spark: SparkSession, decoded: Dataset[DecodedFrame],
      targetLen: Int): DataFrame = {
    import spark.implicits._
    require(targetLen > 0, s"targetLen must be > 0, got $targetLen")
    decoded.map { d =>
      val src = d.pixels
      val out = new Array[Float](targetLen)
      // an empty pixel payload (zero-byte media) has no bins to average:
      // emit zeros instead of indexing src(-1) (round-13 division audit)
      if (src.isEmpty) (d.media_id, d.frame_idx, out)
      else {
      val binW = math.max(1, src.length / targetLen)
      var i = 0
      while (i < targetLen) {
        val from = math.min(i * binW, src.length - 1)
        val to = math.min(from + binW, src.length)
        var sum = 0.0f
        var j = from
        while (j < to) { sum += src(j); j += 1 }
        out(i) = sum / (to - from)
        i += 1
      }
      (d.media_id, d.frame_idx, out)
      }
    }.toDF("media_id", "frame_idx", "features")
  }

  /** Frame sampling for multi-frame media: keep every `stride`-th frame
    * (plus frame 0). Pure filter on the frame index — runs at scan speed,
    * never decodes dropped frames in a codec-backed deployment.
    */
  def sampleFrames(decoded: Dataset[DecodedFrame], stride: Int): Dataset[DecodedFrame] =
    decoded.filter(d => d.frame_idx % stride == 0)

  /** Metadata/feature extraction without decoding: pure column expressions
    * over the bytes (length, entropy-proxy histogram moments) — the
    * "cheap pass" that runs at full scan speed.
    */
  def byteStats(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      length(col("bytes")).as("n_bytes"),
      col("meta.format").as("format"),
      (col("meta.width") * col("meta.height")).as("n_pixels"))
}

/** The codec seam. `decodeToFeatures` stands in for a real image/audio
  * decode (`???` in a codec-equipped deployment would be the JNI/library
  * call); the deterministic fake hashes the bytes into a fixed-size float
  * vector so downstream feature plumbing (similarity, stats) is real.
  */
object MediaCodec {
  def decodeToFeatures(bytes: Array[Byte], width: Int, height: Int): Array[Float] = {
    // REAL-CODEC SEAM: replace with actual decode; deterministic fake below.
    val out = new Array[Float](16)
    var i = 0
    while (i < bytes.length) {
      out(i % 16) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    val n = math.max(1, bytes.length / 16)
    var j = 0
    while (j < 16) { out(j) /= n; j += 1 }
    out
  }
}
