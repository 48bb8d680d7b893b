package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{Media, Phash}

/** pHash vs a sequential integer-DCT reference. */
class PhashSpec extends SparkSuite {
  import spark.implicits._

  /** Plain-Scala replay of the exact integer contract. */
  private def phashRef(bytes: Array[Byte]): Long = {
    val x = Array.tabulate(Phash.Rows, Phash.Cols)((r, c) =>
      (bytes(r * Phash.Cols + c) & 0xff).toLong)
    val t1 = Array.tabulate(Phash.Keep, Phash.Cols)((u, c) =>
      (0 until Phash.Rows).map(r => Phash.basis(r, u, Phash.Rows) * x(r)(c)).sum)
    val y = for {
      u <- 0 until Phash.Keep; v <- 0 until Phash.Keep
      if !(u == 0 && v == 0)
    } yield ((u, v),
      (0 until Phash.Cols).map(c => Phash.basis(c, v, Phash.Cols) * t1(u)(c)).sum)
    val med = y.map(_._2).sorted.apply(31) // 32nd smallest of 63
    y.map { case ((u, v), yy) =>
      if (yy > med) 1L << (u * Phash.Keep + v - 1) else 0L
    }.sum
  }

  test("distributed phash equals the sequential integer-DCT reference") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "totally different text"),
      (3L, "alpha beta gamma")).toDF("doc_id", "text")
    val media = Media.syntheticMediaFromDocs(docs)
    val got = Phash.phash(spark, media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bytesById = media.select("media_id", "bytes").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    bytesById.foreach { case (id, b) =>
      assert(b.length === Phash.Rows * Phash.Cols)
      assert(got(id) === phashRef(b), s"media $id")
    }
    assert(got(1L) === got(3L)) // identical text → identical blob → same hash
    assert(got(1L) !== got(2L))
  }

  test("basis table is the integer DCT-II: row 0 flat, symmetry") {
    (0 until Phash.Rows).foreach(n => assert(Phash.basis(n, 0, Phash.Rows) === 1024L))
    // cos antisymmetry of the u=1 row: C[n] = -C[N-1-n]
    (0 until Phash.Rows).foreach { n =>
      assert(Phash.basis(n, 1, Phash.Rows) === -Phash.basis(Phash.Rows - 1 - n, 1, Phash.Rows))
    }
  }
}
