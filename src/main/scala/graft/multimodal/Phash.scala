package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual image hashing (pHash) over media blobs — the image-side
  * analogue of SimHash: a 2D DCT compresses the pixel grid into its
  * low-frequency coefficients, each coefficient contributes one bit
  * (above/below the coefficient median), and near-identical images land
  * within a small Hamming distance. Used by large-scale multimodal corpora
  * (e.g. LAION's pHash dedup) to kill re-encoded / resized duplicates that
  * byte-level hashing misses.
  *
  * All arithmetic is INTEGER: the DCT basis is a fixed table of
  * `round(1024·cos(π(2n+1)u/2N))` literals and pixel values are 0..255
  * bytes, so every coefficient is an exact BIGINT and the hash is
  * bit-reproducible on any engine — the same scaled-int contract as the
  * repo's text kernels (a float DCT would flip bits across libm
  * implementations exactly at the median ties the bits depend on).
  *
  * Scale shape: the whole computation is two broadcast-joined
  * fan-out/aggregate stages (the separable row/column DCT), one 63-element
  * sort per image for the median, and one bit-sum — all map-side
  * combinable, nothing quadratic, no UDFs. The blob is the synthetic
  * 8×16 fake-decode image ([[Media.syntheticMediaFromDocs]]); a codec
  * deployment would swap the pixel source at the [[MediaCodec]] seam and
  * use 32×32 / keep-8×8, changing only the basis tables.
  */
object Phash {

  val Rows = 8 // image rows (N=8 DCT)
  val Cols = 16 // image cols (N=16 DCT)
  val Keep = 8 // low-frequency coefficients kept per axis
  val Scale = 1024L

  /** Integer DCT-II basis: round(1024·cos(π(2n+1)u/(2N))). */
  def basis(n: Int, u: Int, N: Int): Long =
    math.round(Scale * math.cos(math.Pi * (2 * n + 1) * u / (2.0 * N)))

  private def basisDf(spark: org.apache.spark.sql.SparkSession,
      N: Int, keep: Int, uCol: String, nCol: String, wCol: String): DataFrame = {
    import spark.implicits._
    (for { u <- 0 until keep; n <- 0 until N } yield (u, n, basis(n, u, N)))
      .toDF(uCol, nCol, wCol)
  }

  /** Per-media 63-bit perceptual hash from the synthetic media table
    * (media_id, bytes). Returns (media_id, phash).
    */
  def phash(spark: org.apache.spark.sql.SparkSession, media: DataFrame): DataFrame = {
    val rowB = basisDf(spark, Rows, Keep, "u", "r", "wr")
    val colB = basisDf(spark, Cols, Keep, "v", "c", "wc")
    val pix = media
      .select(col("media_id"), hex(col("bytes")).as("hx"),
        explode(sequence(lit(0), lit(Rows * Cols - 1))).as("p"))
      .select(col("media_id"),
        (col("p") / Cols).cast("int").as("r"), (col("p") % Cols).as("c"),
        conv(col("hx").substr(col("p") * 2 + 1, lit(2)), 16, 10)
          .cast("long").as("x"))
    // separable 2D DCT in exact integers: rows first, then columns
    val t1 = pix.join(broadcast(rowB), "r")
      .groupBy(col("media_id"), col("u"), col("c"))
      .agg(sum(col("wr") * col("x")).as("t"))
    val y = t1.join(broadcast(colB), "c")
      .groupBy(col("media_id"), col("u"), col("v"))
      .agg(sum(col("wc") * col("t")).as("y"))
      .where(!(col("u") === 0 && col("v") === 0))
    // median of the 63 kept coefficients = 32nd smallest; bit = y > median
    val med = y.groupBy("media_id")
      .agg(element_at(array_sort(collect_list(col("y"))), 32).as("med"))
    y.join(med, "media_id")
      .select(col("media_id"),
        when(col("y") > col("med"),
            expr(s"shiftleft(CAST(1 AS BIGINT), CAST(u * $Keep + v - 1 AS INT))"))
          .otherwise(lit(0L)).as("bit"))
      .groupBy("media_id")
      .agg(sum("bit").as("phash"))
  }
}
