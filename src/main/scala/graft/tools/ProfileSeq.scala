package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: run a sequence of gate queries in one session, timing each —
  * reproduces in-bench context effects.
  */
object ProfileSeq {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // "ALL" expands to every gate in bench (sorted) order — a bench-
    // faithful sequence with live per-gate output for external correlation
    // (jstack/iostat sampling during the run)
    val names = if (args.sameElements(Array("ALL")))
      graft.SparkEntry.queries.keys.toSeq.sorted else args.toSeq
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      val qSec = (System.nanoTime() - t0) / 1e9
      val tR = System.nanoTime()
      graft.ops.Pins.releaseAll(spark) // bench-faithful inter-gate cleanup
      val rSec = (System.nanoTime() - tR) / 1e9
      println(f"[seq] ${System.currentTimeMillis()} $name: $qSec%.2f s " +
        f"($n rows, release $rSec%.2f s)")
      Console.out.flush()
    }
    spark.stop()
  }
}
