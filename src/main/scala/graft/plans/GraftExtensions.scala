package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst optimizer rules that rewrite composed expression chains into
  * graft's fused kernels — so plain-SQL / plain-DataFrame users get the
  * native paths without knowing they exist. Registered either globally
  * (`spark.sql.extensions=graft.plans.GraftExtensions`) or on a live
  * session (`GraftExtensions.install(spark)`, which uses
  * `experimental.extraOptimizations` — same rules, no restart).
  *
  * Both rewrites are semantics-preserving by the kernels' own parity
  * contracts (KernelParitySpec pins [[graft.functions.Hash60]] bit-equal
  * to the composed md5 chain; Spark's bounded levenshtein returns the
  * exact distance whenever it is ≤ the threshold).
  */
object FuseHash60Rule extends Rule[LogicalPlan] {

  private object StringLit {
    def unapply(e: Expression): Option[String] = e match {
      case Literal(s: UTF8String, StringType) => Some(s.toString)
      case _ => None
    }
  }
  private object IntLike {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case Literal(v: Long, LongType) => Some(v)
      case _ => None
    }
  }

  /** `CAST(conv(substring(md5(concat_ws(':', seed, c)), 1, 15), 16, 10) AS BIGINT)`
    * → native [[graft.functions.Hash60]](c, seed). The seed must be a
    * literal (it is baked into the kernel's pre-encoded prefix).
    *
    * Null care: `concat_ws` SKIPS null children, so the composed chain
    * hashes just `"<seed>"` when c is null, while the null-intolerant
    * kernel returns null — for nullable inputs the rewrite keeps an
    * explicit null branch with that constant, so the rewritten plan is
    * value-identical on EVERY input, not just the non-null ones.
    */
  /** The analyzer wraps md5's string child in an implicit binary cast —
    * accept both shapes.
    */
  private object MaybeBinaryCast {
    def unapply(e: Expression): Option[Expression] = e match {
      case Cast(inner, org.apache.spark.sql.types.BinaryType, _, _) => Some(inner)
      case other => Some(other)
    }
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case cast @ Cast(conv: Conv, LongType, _, _) =>
      conv match {
        case Conv(Substring(Md5(MaybeBinaryCast(
              ConcatWs(Seq(StringLit(":"), StringLit(seed), c)))),
              IntLike(1), IntLike(15)), IntLike(16), IntLike(10), _)
            if c.dataType == StringType =>
          val fused = graft.functions.Hash60(c, seed)
          if (!c.nullable) fused
          else {
            val whenNull = graft.functions.Hash60Impl.hash(
              seed.getBytes("UTF-8"), UTF8String.fromString(""))
            If(IsNull(c), Literal(whenNull, LongType), fused)
          }
        case _ => cast
      }
  }
}

/** `levenshtein(a, b) <= k` (k literal ≥ 0) → `levenshtein(a, b, k) >= 0`:
  * the bounded kernel is O(k·min(len)) with early exit instead of the
  * full O(len²) DP table — the difference between a usable and an
  * unusable edit-distance prefilter in a join condition. (The bounded
  * form returns -1 when the distance exceeds k, the exact distance
  * otherwise, so the predicates are equivalent.) `<` of a positive
  * literal rewrites through `<= k-1`.
  */
object BoundLevenshteinRule extends Rule[LogicalPlan] {

  private object PosIntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) if v >= 0 => Some(v)
      case _ => None
    }
  }
  private def bounded(a: Expression, b: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(k))), Literal(0))

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThanOrEqual(Levenshtein(a, b, None), PosIntLit(k)) => bounded(a, b, k)
    case GreaterThanOrEqual(PosIntLit(k), Levenshtein(a, b, None)) => bounded(a, b, k)
    case LessThan(Levenshtein(a, b, None), PosIntLit(k)) if k > 0 => bounded(a, b, k - 1)
    case GreaterThan(PosIntLit(k), Levenshtein(a, b, None)) if k > 0 => bounded(a, b, k - 1)
  }
}

/** Entry point for `spark.sql.extensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => FuseHash60Rule)
    e.injectOptimizerRule(_ => BoundLevenshteinRule)
  }
}

object GraftExtensions {
  /** Install the rules on an already-running session. Idempotent. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    val add = Seq(FuseHash60Rule, BoundLevenshteinRule).filterNot(cur.contains)
    spark.experimental.extraOptimizations = cur ++ add
  }
}
