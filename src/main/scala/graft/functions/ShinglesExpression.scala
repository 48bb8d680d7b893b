package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused kernel: ASCII-lower → whitespace-tokenize → word n-gram windows →
  * distinct (first-occurrence order). Bit-identical to the composed form
  * `array_distinct(transform(sequence..., i => concat_ws(" ",
  * slice(tokens, i+1, n))))` over `TextAnalysis.tokens`, but one pass over
  * the string instead of a 6-deep interpreted expression tree — the
  * dominant cost of MinHash shingling at scale.
  */
object ShinglesImpl {
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    // ASCII lower + whitespace split, preserving token order
    val toks = mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= s.length) {
      val isWs = i == s.length || Character.isWhitespace(s.charAt(i))
      if (isWs) {
        if (sb.length > 0) { toks += sb.toString; sb.setLength(0) }
      } else {
        val c = s.charAt(i)
        sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      }
      i += 1
    }
    if (toks.size < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var j = 0
    while (j + n <= toks.size) {
      val w = new java.lang.StringBuilder
      var k = 0
      while (k < n) {
        if (k > 0) w.append(' ')
        w.append(toks(j + k))
        k += 1
      }
      seen.add(w.toString)
      j += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { out(m) = UTF8String.fromString(it.next()); m += 1 }
    new GenericArrayData(out)
  }
}

/** `word_shingles(text, n)` as a native expression (see [[ShinglesImpl]]).
  * NOTE: tokenization here matches [[TextAnalysis.tokens]] for ASCII
  * whitespace; Java regex `\s` and `Character.isWhitespace` agree on the
  * ASCII range (the declared contract of the text operators).
  */
case class WordShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires a string child, got ${child.dataType}")
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    ShinglesImpl.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShinglesImpl.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)
}

object WordShinglesExpr {
  def apply(c: Column, n: Int): Column =
    org.apache.spark.sql.graft.GraftBridge.toColumn(
      WordShinglesExpr(org.apache.spark.sql.graft.GraftBridge.toExpression(c), n))
}
