package graft.functions

import java.text.Normalizer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side kernel for Unicode normalization.
  *
  * Canonical-equivalent strings (é composed vs e + U+0301) hash, compare,
  * and dedup differently byte-for-byte — a real-corpus ingestion step
  * normalizes before any fingerprint/join. Backed by `java.text.Normalizer`
  * (ICU-equivalent for the NFC/NFD/NFKC/NFKD forms, stable across JDK
  * releases for assigned codepoints); DuckDB's `nfc_normalize` is the
  * oracle twin for the NFC form.
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and
  * true for virtually every real-world string (ASCII always) — the
  * normalizing allocation only happens on the rare composed/decomposed
  * mismatch.
  */
object NormalizeImpl {
  def normalize(value: UTF8String, form: Normalizer.Form): UTF8String = {
    val s = value.toString
    if (Normalizer.isNormalized(s, form)) value
    else UTF8String.fromString(Normalizer.normalize(s, form))
  }
}

/** Native Catalyst expression: `unicodeNormalize(col, "NFC"|"NFD"|"NFKC"|"NFKD")`.
  * Codegen'd single call; null-intolerant like the other graft kernels.
  */
case class UnicodeNormalize(child: Expression, formName: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unicodeNormalize requires a string child, got ${child.dataType}")
    else if (!Set("NFC", "NFD", "NFKC", "NFKD").contains(formName))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unknown normalization form $formName")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unicode_normalize"

  @transient private lazy val form: Normalizer.Form =
    Normalizer.Form.valueOf(formName)

  override protected def nullSafeEval(input: Any): Any =
    NormalizeImpl.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("form", form, "java.text.Normalizer.Form")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NormalizeImpl.normalize($c, $formRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  def apply(c: Column, form: String): Column =
    org.apache.spark.sql.graft.GraftBridge.toColumn(
      UnicodeNormalize(org.apache.spark.sql.graft.GraftBridge.toExpression(c), form))

  /** Register `unicode_normalize(col, 'NFC')` for SQL users. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "unicode_normalize",
      exprs => UnicodeNormalize(exprs.head,
        exprs(1).eval(null).asInstanceOf[UTF8String].toString),
      "built-in")
}
