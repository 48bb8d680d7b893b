package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding quantization for ANN at scale: symmetric per-vector int8 —
  * q[i] = round(v[i] · 127 / max|v|), dequantized as q[i] · scale with
  * scale = max|v| / 127. Shrinks a float32 corpus 4× (the difference
  * between an index fitting executor memory or not) at a bounded error of
  * scale/2 per component (QuantizeSpec proves the bound).
  *
  * All math is a per-row column expression (no shuffle, no UDF): the
  * rounding is the portable floor(x + 0.5) form, so any engine reproduces
  * the quantized codes bit-for-bit — which also makes the codes a stable
  * content fingerprint of the vector across reruns and engines.
  */
object Quantize {

  /** max|v| of a float-array column, computed in double. */
  def maxAbs(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** Symmetric int8 codes as an array<long> (range [-127, 127]); an
    * all-zero vector quantizes to zeros.
    */
  def int8Codes(vec: Column): Column = {
    val mx = maxAbs(vec)
    when(mx > 0,
      transform(vec, x => floor(x.cast("double") * 127.0d / mx + 0.5d).cast("long")))
      .otherwise(transform(vec, _ => lit(0L)))
  }

  /** Dequantized doubles from codes + the vector's maxAbs. */
  def dequantize(codes: Column, mxAbs: Column): Column =
    transform(codes, q => q.cast("double") * mxAbs / 127.0d)
}
