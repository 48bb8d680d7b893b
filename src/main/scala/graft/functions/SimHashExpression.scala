package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-pass SimHash bit-majority vote over a pre-hashed token array.
  *
  * Replaces the composed form (per bit b: `aggregate(hashes, 0, acc +
  * if(bit set, 1, -1))`, then a sum of `bits` when-columns), which scans
  * the array `bits` times in INTERPRETED eval. This kernel walks the
  * array once, updating all `bits` vote counters per element.
  *
  * Bit-compat contract with the composed form:
  *  - null array → 0 (each aggregate yields null, `when(null > 0, …)
  *    .otherwise(0)` yields 0, the sum of zeros is 0);
  *  - null element → a −1 vote on every bit (`when(null === 1, 1)
  *    .otherwise(-1)`);
  *  - empty array → all votes 0, no bit set → 0.
  */
object SimHashImpl {
  def compute(hashes: ArrayData, bits: Int): Long = {
    val votes = new Array[Int](bits)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      if (hashes.isNullAt(i)) {
        var b = 0
        while (b < bits) { votes(b) -= 1; b += 1 }
      } else {
        val h = hashes.getLong(i)
        var b = 0
        while (b < bits) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

case class SimHashBits(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 63, s"simhash bits must be in [1, 63], got $bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash_bits"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_bits requires array<bigint>, got $other")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else SimHashImpl.compute(v.asInstanceOf[ArrayData], bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = ${c.isNull} ? 0L :
          graft.functions.SimHashImpl.compute(${c.value}, $bits);
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

object SimHashBits {
  def apply(hashes: Column, bits: Int): Column =
    org.apache.spark.sql.graft.GraftBridge.toColumn(
      SimHashBits(org.apache.spark.sql.graft.GraftBridge.toExpression(hashes), bits))
}
