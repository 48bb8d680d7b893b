package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Minimal repro of the q203 path through runBatchedAppend. */
object DedupGateRepro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = 1700000000L * 1000000L
    val hour = 3600L * 1000000L
    // user 1: b0 at base, b1 at base+1h, b2 at base+2h
    // user 9: sets batch maxima high (base+30h each batch)
    val rows = Seq(
      (1L, 0, base), (1L, 1, base + hour), (1L, 2, base + 2 * hour),
      (3L, 2, base + 2 * hour), // brand-new key, same late ts, same batch
      (9L, 0, base + 30 * hour), (9L, 1, base + 31 * hour),
      (9L, 2, base + 32 * hour))
    val synth = rows.toDF("user_id", "b", "us")
      .select(col("user_id"), col("b"),
        expr("timestamp_micros(us)").as("ts"))
    val parts = (0 to 2).map(b =>
      synth.filter(col("b") === b).select("user_id", "ts"))
    // wm2 = (base+30h)/ms - 2h ; user1 expiry = base+2h <= wm2 -> evict at
    // end of batch 2 -> batch-3 row (base+2h) re-admits -> expect user1 n=2
    // inline drain with progress instrumentation
    val tmp = java.nio.file.Files.createTempDirectory("rp").toString
    parts.zipWithIndex.foreach { case (pdf, i) =>
      graft.io.SingleFile.writeParquetAtomic(pdf, f"$tmp/in/part$i%03d.parquet")
      java.nio.file.Files.setLastModifiedTime(
        java.nio.file.Paths.get(s"$tmp/in", f"part$i%03d.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 60000 + i * 2000))
    }
    val stream = spark.readStream.schema(parts.head.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/in")
    val q = stream.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id")
      .select("user_id", "ts")
      .writeStream.format("parquet")
      .outputMode("append")
      .option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    q.recentProgress.foreach { pr =>
      val so = pr.stateOperators
      println(s"[repro] batch=${pr.batchId} in=${pr.numInputRows} wm=${pr.eventTime.get("watermark")} " +
        (if (so.nonEmpty) s"stateRows=${so(0).numRowsTotal} upd=${so(0).numRowsUpdated} rm=${so(0).numRowsRemoved} lateDrop=${so(0).numRowsDroppedByWatermark}" else ""))
    }
    spark.read.parquet(s"$tmp/out").orderBy("user_id", "ts").collect().foreach { r =>
      println(s"[repro] user=${r.getLong(0)} ts=${r.getTimestamp(1).getTime}")
    }
    spark.stop()
  }
}
