package graft

import org.apache.spark.sql.functions._
import graft.ops.Quantize

/** int8 quantization: codes in range, zeros edge case, and the dequant
  * error bound |dequant - orig| ≤ scale/2 (+ float32 cast slack).
  */
class QuantizeSpec extends SparkSuite {
  import spark.implicits._

  test("codes bounded, zero vector quantizes to zeros, error within scale/2") {
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 50).map(i =>
      (i.toLong, Array.fill(16)((rnd.nextDouble() * 2 - 1).toFloat))) :+
      (99L, Array.fill(16)(0.0f))
    val df = vecs.toDF("vec_id", "embedding")
    val out = df.select(
        col("vec_id"), col("embedding"),
        Quantize.maxAbs(col("embedding")).as("mx"),
        Quantize.int8Codes(col("embedding")).as("codes"))
      .withColumn("deq", Quantize.dequantize(col("codes"), col("mx")))
      .collect()
    out.foreach { r =>
      val mx = r.getDouble(2)
      val codes = r.getSeq[Long](3)
      val orig = r.getSeq[Float](1)
      val deq = r.getSeq[Double](4)
      assert(codes.forall(c => c >= -127 && c <= 127))
      if (r.getLong(0) == 99L) assert(codes.forall(_ == 0L) && mx == 0.0)
      else {
        val scale = mx / 127.0
        orig.zip(deq).foreach { case (o, d) =>
          assert(math.abs(o.toDouble - d) <= scale / 2 + 1e-9,
            s"err ${math.abs(o.toDouble - d)} > ${scale / 2}")
        }
      }
    }
  }

  test("pqCodes: hand-fixture codes and exact error; tie picks the lowest centroid index") {
    // 4-dim vectors, 2 subspaces of 2 dims, centroids = first 2 rows
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 1.0f)),
      (2L, Seq(0.0f, 1.0f, 1.0f, 0.0f)),
      (3L, Seq(1.0f, 0.0f, 1.0f, 0.0f)),
      (4L, Seq(0.8f, 0.1f, 0.5f, 0.5f))
    ).toDF("id", "vec")
    val cents = Quantize.pqSeedCentroids(vecs, "id", "vec", 2, 2)
    // m0: c0=(1e6,0) c1=(0,1e6); m1: c0=(0,1e6) c1=(1e6,0)
    assert(cents(0)(0).toSeq == Seq(1000000L, 0L))
    assert(cents(1)(1).toSeq == Seq(1000000L, 0L))
    val out = Quantize.pqCodes(vecs, "id", "vec", cents)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) === (("0-0", 0L)))
    assert(out(2L) === (("1-1", 0L)))
    assert(out(3L) === (("0-1", 0L)))
    // row 4 sub0 → c0, dist (2e5)² + (1e5)² = 5e10; sub1 (5e5,5e5) is
    // EQUIDISTANT to both centroids (5e11) → tie → code 0
    assert(out(4L) === (("0-0", 50000000000L + 500000000000L)))
  }

  test("adcTopK: ADC distance equals exact distance to the PQ reconstruction") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 1.0f)),
      (2L, Seq(0.0f, 1.0f, 1.0f, 0.0f)),
      (3L, Seq(1.0f, 0.0f, 1.0f, 0.0f)),
      (4L, Seq(0.8f, 0.1f, 0.5f, 0.5f)),
      (5L, Seq(0.0f, 0.9f, 0.9f, 0.1f))
    ).toDF("id", "vec")
    val cents = Quantize.pqSeedCentroids(vecs, "id", "vec", 2, 2)
    val out = Quantize.adcTopK(vecs, "id", "vec", cents, col("id") === 1L, k = 5)
      .orderBy("rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // sequential reference: reconstruct each doc from its codes (computed
    // by the proven pqCodes fixture above), then exact ‖q − recon‖²
    val codes = Map(1L -> Seq(0, 0), 2L -> Seq(1, 1), 3L -> Seq(0, 1),
      4L -> Seq(0, 0), 5L -> Seq(1, 1))
    val q = Array(1000000L, 0L, 0L, 1000000L)
    val ref = codes.map { case (id, cs) =>
      val recon = cs.zipWithIndex.flatMap { case (c, mi) => cents(mi)(c) }
      id -> recon.zip(q).map { case (r, x) => val d = r - x; d * d }.sum
    }
    assert(out.length === 5)
    out.foreach { case (qid, did, adc, _) =>
      assert(qid === 1L); assert(adc === ref(did))
    }
    // ranking is (adc asc, id asc): docs 1 and 4 share code 0-0 → adc 0,
    // id breaks the tie
    assert(out.map(_._2).take(2).toSeq === Seq(1L, 4L))
    assert(out.map(_._4).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
  }
}
