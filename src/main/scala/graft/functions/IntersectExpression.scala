package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Intersection size of two SORTED-DISTINCT string arrays by merge scan.
  *
  * Drop-in for `size(array_intersect(a, b))` when both inputs are
  * `sort_array(array_distinct(…))`: same count, but a linear two-pointer
  * walk with zero allocation instead of building a hash set per CALL —
  * which matters because pairwise-similarity joins evaluate this once per
  * candidate pair, making the hash-set build the dominant per-pair cost.
  *
  * Compare order is UTF8String binary order — exactly `sort_array`'s
  * StringType ordering, with null elements first (both-null counts as a
  * match, as `array_intersect` keeps a null present in both sides).
  * Null arrays → null, like `size(array_intersect(...))` with
  * `spark.sql.legacy.sizeOfNull=false`.
  */
object SortedIntersectImpl {
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val an = a.isNullAt(i)
      val bn = b.isNullAt(j)
      val cmp =
        if (an && bn) 0
        else if (an) -1
        else if (bn) 1
        else a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }
}

case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_size"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_size requires two array<string> children, " +
        s"got ${left.dataType} and ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectImpl.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectImpl.count($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftBridge.toColumn(
      SortedIntersectSize(org.apache.spark.sql.graft.GraftBridge.toExpression(a),
        org.apache.spark.sql.graft.GraftBridge.toExpression(b)))
}
