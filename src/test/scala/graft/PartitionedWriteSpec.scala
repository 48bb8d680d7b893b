package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Write-side layout levers proven on executed scans: hive-style partition
  * pruning and nested-schema pruning. At 100 TB these decide whether a
  * selective read touches 1/kth of the files or all of them.
  */
class PartitionedWriteSpec extends SparkSuite {
  import spark.implicits._

  private def scans(df: org.apache.spark.sql.DataFrame): Seq[FileSourceScanExec] = {
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case s: FileSourceScanExec => s }
  }

  test("hive-partitioned write + selective read prunes partitions at the scan") {
    val dir = tmpDir("part_write")
    Tables.events(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)

    val clicks = spark.read.parquet(dir).filter(col("event_type") === "click")
    val n = clicks.count()
    assert(n > 0)

    val scan = scans(clicks.filter(col("event_type") === "click")).head
    assert(scan.partitionFilters.nonEmpty,
      s"expected partition filters on the scan: $scan")
    // the pruned file set is strictly smaller than the full table's
    val all = spark.read.parquet(dir)
    assert(clicks.inputFiles.length <= all.inputFiles.length)
    val prunedFiles = scan.relation.location.listFiles(
      scan.partitionFilters, scan.dataFilters).map(_.files.size).sum
    val allFiles = scan.relation.location.listFiles(Nil, Nil).map(_.files.size).sum
    assert(prunedFiles < allFiles,
      s"partition pruning ineffective: $prunedFiles of $allFiles files")
  }

  test("nested-field projection prunes the parquet read schema") {
    val dir = tmpDir("nested_prune")
    Seq((1L, ("a", 10L, 3.5), "x"), (2L, ("b", 20L, 4.5), "y"))
      .toDF("id", "payload", "tag")
      .write.mode("overwrite").parquet(dir)

    val slim = spark.read.parquet(dir).select(col("payload._2").as("v"))
    assert(slim.collect().map(_.getLong(0)).sorted === Array(10L, 20L))
    val scan = scans(slim).head
    val read = scan.requiredSchema.catalogString
    assert(read.contains("_2") && !read.contains("_1") && !read.contains("_3"),
      s"expected only payload._2 in ReadSchema, got: $read")
    assert(!scan.requiredSchema.fieldNames.contains("tag"))
  }
}
