package graft

import org.apache.spark.sql.functions._
import graft.plans.{FuseHash60Rule, GraftExtensions}

/** The SparkSessionExtensions optimizer rules: composed chains written by
  * users who don't know the kernels exist must be rewritten into the
  * native forms, value-identically — including the null-input corner the
  * composed `concat_ws` handles differently.
  *
  * The fixtures derive from `range()` (never `Seq.toDF`): the
  * ConvertToLocalRelation rule would otherwise evaluate the whole
  * projection at optimize time and leave no expression to rewrite.
  */
class PlanRulesSpec extends SparkSuite {

  private lazy val ext = {
    val s = spark.newSession()
    GraftExtensions.install(s)
    GraftExtensions.install(s) // idempotent
    assert(s.experimental.extraOptimizations.count(_ == FuseHash60Rule) == 1)
    s
  }

  /** id 0..3 → "v0", "v1", null, "v3". */
  private def fixture(s: org.apache.spark.sql.SparkSession) =
    s.range(4).withColumn("s",
      when(col("id") === 2, lit(null).cast("string"))
        .otherwise(concat(lit("v"), col("id"))))

  test("FuseHash60Rule rewrites the composed md5 chain to the native kernel, same values") {
    val df = fixture(ext)
      .withColumn("h", graft.functions.Hashing.hash60Composed(col("s"), "xk"))
    val optimized = df.queryExecution.optimizedPlan
    assert(allExprs(optimized).exists(_.exists(_.isInstanceOf[graft.functions.Hash60])),
      s"no Hash60 in:\n$optimized")
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    def jvm(s: String) = graft.functions.Hashing.hash60Jvm(s, "xk")
    assert(got(0L) === jvm("v0"))
    assert(got(1L) === jvm("v1"))
    assert(got(3L) === jvm("v3"))
    // null input: concat_ws skips the null, so the chain hashes just "xk"
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("xk".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(got(2L) === java.lang.Long.parseLong(hex.substring(0, 15), 16))
    // the un-extended session computes identical values from the chain
    val plain = fixture(spark)
      .withColumn("h", graft.functions.Hashing.hash60Composed(col("s"), "xk"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === plain)
    // the un-extended session keeps the composed chain (no Hash60 node)
    assert(!allExprs(fixture(spark)
      .withColumn("h", graft.functions.Hashing.hash60Composed(col("s"), "xk"))
      .queryExecution.optimizedPlan)
      .exists(_.exists(_.isInstanceOf[graft.functions.Hash60])))
  }

  private def allExprs(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
    plan.collect { case n => n }.flatMap(_.expressions)

  /** id 0..3 → (a, b) pairs with distances 3, 1, 0, 6. */
  private def levFixture(s: org.apache.spark.sql.SparkSession) =
    s.range(4).select(col("id"),
      element_at(typedLit(Seq("kitten", "abc", "same", "a")), col("id").cast("int") + 1).as("a"),
      element_at(typedLit(Seq("sitting", "abd", "same", "zzzzzzz")), col("id").cast("int") + 1).as("b"))

  test("BoundLevenshteinRule bounds bare levenshtein comparisons, same survivors") {
    val df = levFixture(ext).filter(levenshtein(col("a"), col("b")) <= 2)
    val lev = allExprs(df.queryExecution.optimizedPlan)
      .flatMap(_.collect { case l: org.apache.spark.sql.catalyst.expressions.Levenshtein => l })
    assert(lev.nonEmpty && lev.forall(_.threshold.isDefined),
      s"unbounded levenshtein survived:\n${df.queryExecution.optimizedPlan}")
    // distances: kitten/sitting 3 (out), abc/abd 1 (in), same/same 0 (in),
    // a/zzzzzzz 7 (out)
    assert(df.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    // strict < form bounds at k-1: only distance 0 survives "< 1"
    val df2 = levFixture(ext).filter(levenshtein(col("a"), col("b")) < 1)
    assert(df2.collect().map(_.getLong(0)).toSeq === Seq(2L))
    // parity with the un-extended session
    assert(levFixture(spark).filter(levenshtein(col("a"), col("b")) <= 2)
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
  }

  test("rules are not installed on the base session") {
    val df = levFixture(spark).filter(levenshtein(col("a"), col("b")) <= 1)
    val lev = allExprs(df.queryExecution.optimizedPlan)
      .flatMap(_.collect { case l: org.apache.spark.sql.catalyst.expressions.Levenshtein => l })
    assert(lev.nonEmpty && lev.forall(_.threshold.isEmpty))
  }
}
