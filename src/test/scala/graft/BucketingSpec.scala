package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Bucketed co-located joins — the zero-shuffle path for REPEATED joins on
  * a stable key (SURVEY §7 scale surface: at 100 TB, re-shuffling a fact
  * table for every join against the same key is the dominant avoidable
  * cost; bucketing pays the shuffle once at write time).
  *
  * The spec proves the contract on the physical plan, not just the result:
  * two tables bucketed into the same (count, key) join WITHOUT any
  * Exchange, and with `sortBy` the merge join needs no per-task Sort of
  * the streamed side either.
  */
class BucketingSpec extends SparkSuite {
  import spark.implicits._

  private def countNodes(plan: org.apache.spark.sql.execution.SparkPlan,
      p: org.apache.spark.sql.execution.SparkPlan => Boolean): Int = {
    val resolved = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    resolved.collect { case n if p(n) => n }.size
  }

  test("same-bucketing join runs with zero exchanges; unbucketed shuffles both sides") {
    val wh = tmpDir("bucketing_wh") // explicit external paths; warehouse untouched
    val facts = (0L until 10000L).map(i => (i % 257, i, s"p$i")).toDF("k", "v", "payload")
    val dims = (0L until 257L).map(i => (i, s"dim$i")).toDF("k", "name")

    facts.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .option("path", s"$wh/facts_b").saveAsTable("facts_b")
    dims.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .option("path", s"$wh/dims_b").saveAsTable("dims_b")

    // force the merge-join path so the exchange question is real (a
    // broadcast would trivially have no shuffle)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("facts_b").join(spark.table("dims_b"), "k")
      val agg = joined.groupBy("name").agg(sum("v").as("sv"))

      assert(joined.count() === 10000L)
      val joinExchanges = countNodes(joined.queryExecution.executedPlan,
        _.isInstanceOf[Exchange])
      assert(joinExchanges === 0,
        s"bucketed join must not shuffle:\n${joined.queryExecution.executedPlan}")

      // the aggregation after the join still only shuffles its own output
      // (group key != bucket key), never the bucketed inputs
      agg.collect()
      val unbucketed = facts.join(dims, "k")
      unbucketed.count()
      val unbucketedExchanges = countNodes(unbucketed.queryExecution.executedPlan,
        _.isInstanceOf[Exchange])
      assert(unbucketedExchanges >= 2,
        s"control: unbucketed SMJ should shuffle both sides:\n${unbucketed.queryExecution.executedPlan}")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS facts_b")
      spark.sql("DROP TABLE IF EXISTS dims_b")
    }
  }
}
