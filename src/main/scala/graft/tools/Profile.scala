package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: time a single query repeatedly to separate plan/codegen cost
  * from steady-state execution.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q04_dedup_keep_first")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("PROFILE_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("PROFILE_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("PROFILE_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (name == "ALL") {
      graft.SparkEntry.queries.foreach { case (n, fn) =>
        val t0 = System.nanoTime()
        val c = fn(spark, sfDir).count()
        println(f"seq $n: ${(System.nanoTime() - t0) / 1e9}%.3f s, $c rows")
        graft.ops.Pins.releaseAll(spark) // bench-faithful inter-gate hygiene
      }
    } else {
      val fn = graft.SparkEntry.queries(name)
      val cold = sys.env.get("PROFILE_COLD").contains("1")
      for (i <- 1 to sys.env.get("PROFILE_RUNS").map(_.toInt).getOrElse(3)) {
        if (cold) spark.catalog.clearCache() // bench-faithful: no cross-run reuse
        val t0 = System.nanoTime()
        val n2 = fn(spark, sfDir).count()
        println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s, $n2 rows")
        // without this, later runs time GC pressure from pinned
        // localCheckpoint blocks, not the gate (the bench loop releases
        // after every gate for the same reason)
        graft.ops.Pins.releaseAll(spark)
      }
    }
    spark.stop()
  }
}
