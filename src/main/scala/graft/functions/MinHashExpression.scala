package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused MinHash + LSH band-key kernel: one pass over the shingle array
  * computes all `bands × rowsPerBand` seeded min-hashes and the per-band
  * md5 bucket keys.
  *
  * Replaces the composed pipeline
  * `sig = array(h => array_min(transform(shingles, s => hash60(s, seed:h))))`
  * → `bands = array(b => md5(concat_ws(",", slice(sig, …) as strings)))`,
  * which had two pathologies at scale:
  *  - higher-order functions evaluate INTERPRETED, so the k× per-shingle
  *    hashing paid lambda dispatch per element;
  *  - CollapseProject re-inlined the whole k-hash signature expression
  *    into every band key (no common-subexpression elimination), so the
  *    signature was computed `bands` times per row — and the resulting
  *    expression tree was large enough to dominate first-run planning.
  *
  * Bit-compat contract with the composed form:
  *  - null shingle array behaves as empty (the composed signature is an
  *    array OF nulls, not null — `transform(null)` nulls every min, and
  *    `concat_ws` then skips them, leaving md5("") per band);
  *  - null shingle elements are skipped (`hash60(null)` is null and
  *    `array_min` ignores nulls);
  *  - a band whose min-hashes are all null (empty/all-null shingles)
  *    md5-hashes the concat of the non-null ones (`concat_ws` skips
  *    nulls; empty → md5 of "");
  *  - hash values are rendered in decimal (`cast to string`) joined with
  *    ",", md5'd to the same lowercase-hex string as Spark's `md5()`.
  */
object MinHashBandImpl {
  def bandKeys(shingles: ArrayData, seedPrefixes: Array[Array[Byte]],
      bands: Int, rowsPerBand: Int): ArrayData = {
    val k = bands * rowsPerBand
    val mins = new Array[Long](k)
    val seen = new Array[Boolean](k)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s = shingles.getUTF8String(i)
        var h = 0
        while (h < k) {
          val v = Hash60Impl.hash(seedPrefixes(h), s)
          if (!seen(h) || v < mins(h)) { mins(h) = v; seen(h) = true }
          h += 1
        }
      }
      i += 1
    }
    val md = Md5.get()
    val out = new Array[Any](bands)
    val sb = new java.lang.StringBuilder(rowsPerBand * 20)
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      var r = 0
      while (r < rowsPerBand) {
        val h = b * rowsPerBand + r
        if (seen(h)) {
          if (sb.length > 0) sb.append(',')
          sb.append(mins(h))
        }
        r += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new Array[Byte](32)
      var j = 0
      while (j < 16) {
        hex(2 * j) = Hex((d(j) >> 4) & 0xf)
        hex(2 * j + 1) = Hex(d(j) & 0xf)
        j += 1
      }
      out(b) = UTF8String.fromBytes(hex)
      b += 1
    }
    new GenericArrayData(out)
  }

  private val Hex: Array[Byte] = "0123456789abcdef".getBytes

  // One digest per executor thread (same pattern as Hash60Impl) — a fresh
  // MessageDigest.getInstance per row is provider-lookup + allocation on
  // the hot path.
  private val Md5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Stand-in for a null shingle array (see null contract above). Accessed
    * from generated Java as `MinHashBandImpl.EmptyArray()` (the static
    * forwarder of this val's accessor).
    */
  val EmptyArray: ArrayData = new GenericArrayData(Array.empty[Any])
}

/** `array<string>` of `bands` LSH bucket keys for one shingle array. */
case class MinHashBandKeys(child: Expression, bands: Int, rowsPerBand: Int,
    seed: String) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_band_keys"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_band_keys requires array<string>, got $other")
    }

  @transient private lazy val seedPrefixes: Array[Array[Byte]] =
    (0 until bands * rowsPerBand).map(h => s"$seed:$h:".getBytes("UTF-8")).toArray

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    val arr = if (v == null) MinHashBandImpl.EmptyArray else v.asInstanceOf[ArrayData]
    MinHashBandImpl.bandKeys(arr, seedPrefixes, bands, rowsPerBand)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val prefixRef = ctx.addReferenceObj("seedPrefixes", seedPrefixes, "byte[][]")
    val c = child.genCode(ctx)
    val javaType = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      .javaType(dataType)
    ev.copy(
      code = code"""
        ${c.code}
        $javaType ${ev.value} = graft.functions.MinHashBandImpl.bandKeys(
          ${c.isNull} ? graft.functions.MinHashBandImpl.EmptyArray() : ${c.value},
          $prefixRef, $bands, $rowsPerBand);
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)
}

object MinHashBandKeys {
  def apply(shingles: Column, bands: Int, rowsPerBand: Int, seed: String): Column =
    org.apache.spark.sql.graft.GraftBridge.toColumn(
      MinHashBandKeys(org.apache.spark.sql.graft.GraftBridge.toExpression(shingles),
        bands, rowsPerBand, seed))
}
