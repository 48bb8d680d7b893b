package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every gate query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON metric line. Queries run in sorted name order for
  * stable, comparable output; failures count -1 s and are listed.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Belt-and-braces vs the round-1 parse failure: even if a state store
      // provider survives a query, its maintenance task never fires mid-bench.
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "1h")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
      spark.catalog.clearCache() // per-query caches must not leak across timings
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // Orderly teardown BEFORE emitting the metric line: stop any streaming
    // query that is still registered, then the state-store maintenance pool,
    // then the session — so no late thread can spew errors after (or into)
    // the one line the driver parses. Metric line is the FINAL stdout line.
    spark.streams.active.foreach { q => try q.stop() catch { case _: Throwable => () } }
    try org.apache.spark.sql.graft.GraftBridge.stopStateStore()
    catch { case _: Throwable => () }
    spark.stop()
    System.out.flush()
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    System.out.flush()
  }
}
