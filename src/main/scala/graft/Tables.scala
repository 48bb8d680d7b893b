package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated star-schema testdata (TESTDATA.md).
  * One parquet file per table under `dir`.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  /** The events table carries a parquet TIMESTAMP(NANOS) column, which the
    * Spark 4 vectorized reader rejects outright. Read nanos as Long
    * (spark.sql.legacy.parquet.nanosAsLong) and truncate to microseconds with
    * *integer* division — a double division would lose precision at ~1.7e18 ns.
    * Truncation (not rounding) matches a ns→µs TIMESTAMP cast in ANSI engines.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")

  /** Documents spread across the default parallelism: the testdata tables
    * are single-file single-row-group parquet (ONE input split), so any
    * per-document heavy expression must be preceded by a repartition or it
    * runs on one core.
    */
  def documentsSpread(s: SparkSession, d: String): DataFrame =
    documents(s, d).repartition(s.sparkContext.defaultParallelism)
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
