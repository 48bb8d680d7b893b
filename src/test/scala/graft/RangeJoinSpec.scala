package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import graft.ops.RangeJoin

/** RangeJoin.bucketed: exact parity with the naive theta join on random
  * intervals (overlapping, empty, multi-bucket spans), and the plan
  * contract — an equi-join, never a nested loop / cartesian.
  */
class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(23)
  private val points = (0L until 500L).map(i => (i, rnd.nextInt(1000).toLong)).toSeq
  private val intervals = (0 until 80).map { i =>
    val lo = rnd.nextInt(1000).toLong
    // includes empty (span 0) and wide multi-bucket spans
    (i.toLong, lo, lo + rnd.nextInt(120).toLong)
  }.toSeq

  test("bucketed range join equals the theta join for every bucket width") {
    val l = points.toDF("pid", "x")
    val r = intervals.toDF("iid", "lo", "hi")
    val want = l.join(r, col("x") >= col("lo") && col("x") < col("hi"))
      .select("pid", "iid").collect().map(row => (row.getLong(0), row.getLong(1))).toSet
    assert(want.nonEmpty)
    for (w <- Seq(1L, 7L, 64L, 1024L)) {
      val got = RangeJoin.bucketed(l, "x", r, "lo", "hi", w)
        .select("pid", "iid").collect().map(row => (row.getLong(0), row.getLong(1)))
      assert(got.length === got.toSet.size, s"duplicate matches at w=$w")
      assert(got.toSet === want, s"mismatch at w=$w")
    }
  }

  test("an interval wider than the replication cap fails fast, naming it") {
    val l = Seq((1L, 5L)).toDF("pid", "x")
    val r = Seq((1L, 0L, 10_000L)).toDF("iid", "lo", "hi")
    // 10k buckets at width 1 > cap 100 → actionable error, not an
    // explode blowup (or, in the extreme, a sequence() array-length throw)
    val e = intercept[Exception] {
      RangeJoin.bucketed(l, "x", r, "lo", "hi", 1L,
        maxBucketsPerInterval = 100L).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("graft.RangeJoin"), s"unexpected error: $e")
    assert(msg.contains("10000") && msg.contains("bucketWidth=1"),
      s"message should name the offending interval: $msg")
    // same data under the default cap still works
    val ok = RangeJoin.bucketed(l, "x", r, "lo", "hi", 1L)
      .select("pid", "iid").collect()
    assert(ok.length === 1)
  }

  test("bucketed range join plans as an equi-join, not a nested loop") {
    val l = points.toDF("pid", "x")
    val r = intervals.toDF("iid", "lo", "hi")
    val joined = RangeJoin.bucketed(l, "x", r, "lo", "hi", 64L)
    joined.collect()
    val bad = joined.queryExecution.executedPlan.collect {
      case b: BroadcastNestedLoopJoinExec => b
      case c: CartesianProductExec => c
    }
    assert(bad.isEmpty,
      s"range join must be an equi-join:\n${joined.queryExecution.executedPlan}")
  }
}
