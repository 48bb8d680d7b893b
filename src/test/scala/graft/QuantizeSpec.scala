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
}
