package graft.ops

import org.apache.spark.sql.{DataFrame, Observation, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Zero-extra-pass data-quality observability: `Dataset.observe` attaches
  * metric expressions to a plan node (CollectMetrics), computed WHILE the
  * frame materializes — at 100 TB the difference between free counters and
  * a second full scan for every quality dashboard.
  *
  * The reference's validate stage re-reads each episode to count nulls /
  * range violations (validate_one.py does a dedicated pass); here the same
  * counters ride along with whatever action the pipeline already runs.
  */
object QualityMetrics {

  /** The standard lineitem quality counters (exact integers only — these
    * feed the oracle-checked gate, so no double sums).
    */
  def lineitemQuality(df: DataFrame): (DataFrame, Observation) = {
    val obs = Observation()
    val observed = df.observe(obs,
      count(lit(1)).as("n_rows"),
      count_if(col("l_shipdate").isNull).as("n_null_ship"),
      count_if(col("l_discount") < 0 || col("l_discount") > 1).as("n_bad_discount"),
      count_if(col("l_quantity") <= 0).as("n_nonpos_qty"),
      sum(graft.functions.Exact.cents(col("l_extendedprice"))).as("sum_price_cents"))
    (observed, obs)
  }

  /** Run `action` on the observed frame and return the collected metrics
    * as a one-row DataFrame (column order = metric order).
    */
  def collect(spark: SparkSession, observed: DataFrame, obs: Observation)(
      action: DataFrame => Unit): DataFrame = {
    action(observed)
    val m = obs.get
    val names = observed.queryExecution.analyzed.collectFirst {
      case c: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics =>
        c.metrics.map(_.name)
    }.getOrElse(m.keys.toSeq)
    val row = Row.fromSeq(names.map(m(_)))
    val schema = org.apache.spark.sql.types.StructType(names.map(n =>
      org.apache.spark.sql.types.StructField(n,
        org.apache.spark.sql.types.LongType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row), 1), schema)
  }
}
