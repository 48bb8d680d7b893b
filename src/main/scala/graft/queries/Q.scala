package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One gate-visible query: a Spark plan plus (when SQL-expressible) the
  * equivalent DuckDB oracle SQL over the same parquet tables. Column names
  * and row order must match between the two — the driver sorts columns by
  * name and hashes values.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, (s, dir) => {
      val df = run(s, dir)
      // Schema-only check (no job): reject boundary types the driver's
      // pandas fetch cannot render stably (decimal — round-9 q198) or
      // sort at all (nested — round-5 q57/q60/q65). Fails in the gate's
      // own spec at construction, not as a red driver row a round later.
      graft.functions.Exact.assertBoundarySafe(name, df.schema)
      df
    }, Some(oracle))
  // every gate carries an oracle since round 6 (a gate the driver cannot
  // check is a gate that doesn't exist — round-5 VERDICT on q70); keep
  // `oracle` an Option so Verify tolerates a future rows-only entry
}
