package graft

import org.apache.spark.sql.functions._
import graft.ops.QualityMetrics

/** observe()/CollectMetrics observability: metrics ride the existing pass
  * and equal an independent aggregation.
  */
class QualityMetricsSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("observed lineitem quality counters equal a dedicated aggregation") {
    val li = Tables.lineitem(spark, sfDir)
    val (observed, obs) = QualityMetrics.lineitemQuality(li)
    val metricsDf = QualityMetrics.collect(spark, observed, obs)(df => { df.count(); () })
    val got = metricsDf.head()

    val want = li.agg(
      count(lit(1)),
      count_if(col("l_shipdate").isNull),
      count_if(col("l_discount") < 0 || col("l_discount") > 1),
      count_if(col("l_quantity") <= 0),
      sum(graft.functions.Exact.cents(col("l_extendedprice")))).head()

    (0 until 5).foreach(i => assert(got.getLong(i) === want.getLong(i), s"metric $i"))
    assert(got.getLong(0) > 0)
  }

  test("the metrics node does not change the observed frame's rows") {
    val li = Tables.lineitem(spark, sfDir)
    val (observed, _) = QualityMetrics.lineitemQuality(li)
    assert(observed.count() === li.count())
    assert(observed.columns === li.columns)
  }
}
