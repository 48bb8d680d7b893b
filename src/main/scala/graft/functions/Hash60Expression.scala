package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side kernel for the portable seeded 60-bit hash.
  *
  * Bit-identical to the composed form
  * `conv(substring(md5(concat_ws(":", seed, c)), 1, 15), 16, 10)`:
  * md5 over the UTF-8 bytes of `"<seed>:<value>"`, then the first 15 hex
  * nibbles (= bytes 0..6 plus the high nibble of byte 7) as a Long.
  */
object Hash60Impl {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** seedPrefix = "<seed>:" pre-encoded once at plan time. */
  def hash(seedPrefix: Array[Byte], value: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    md.update(seedPrefix)
    md.update(value.getBytes)
    val d = md.digest()
    // first 15 hex chars = 60 bits, big-endian nibbles
    ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) | ((d(2) & 0xffL) << 36) |
      ((d(3) & 0xffL) << 28) | ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
      ((d(6) & 0xffL) << 4) | ((d(7) & 0xf0L) >>> 4)
  }
}

/** Native Catalyst expression for the portable hash: one fused,
  * codegen-friendly kernel instead of a 5-deep interpreted chain
  * (concat_ws → md5 → substring → conv → cast), which matters enormously
  * inside higher-order lambdas where Spark evaluates expressions
  * interpreted per array element.
  */
case class Hash60(child: Expression, seed: String) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hash60 requires a string child, got ${child.dataType}")
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hash60"

  @transient private lazy val seedPrefix: Array[Byte] =
    (seed + ":").getBytes("UTF-8")

  override protected def nullSafeEval(input: Any): Any =
    Hash60Impl.hash(seedPrefix, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val prefixRef = ctx.addReferenceObj("seedPrefix", seedPrefix, "byte[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Hash60Impl.hash($prefixRef, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

object Hash60 {
  /** Column-level entry point (replaces the composed md5/conv chain). */
  def apply(c: Column, seed: String): Column =
    org.apache.spark.sql.graft.GraftBridge.toColumn(Hash60(org.apache.spark.sql.graft.GraftBridge.toExpression(c), seed))

  /** Register `hash60(col, seed)` for SQL users. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hash60",
      exprs => Hash60(exprs.head,
        exprs(1).eval(null).asInstanceOf[UTF8String].toString),
      "built-in")
}
