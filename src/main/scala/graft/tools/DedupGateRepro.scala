package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Companion to DedupEvictProbe: resolved the late-admission anomaly
  * (a brand-new key at a late timestamp is dropped exactly like a
  * re-admission — the filter is pure-timestamp) and pins the late-filter
  * BOUNDARY: rows in batch N are filtered against the watermark of batch
  * N−1 (planning value), while eviction uses batch N's own. Boundary
  * cases below place new keys in batch 3 around wmLate = floor_ms(max
  * batch-1 ts) − delay.
  */
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
    val m1 = base + 30 * hour  // batch-1 max
    val m2 = base + 40 * hour  // batch-2 max
    val wmLate = (m1 / 1000L - 3600000L) * 1000L // batch-3 late filter
    val cases = Seq(
      (301L, wmLate - 60000000L), // 1min below
      (302L, wmLate - 1000L),     // 1ms below
      (303L, wmLate - 500L),      // 0.5ms below
      (304L, wmLate),             // exact
      (305L, wmLate + 500L),      // 0.5ms above
      (306L, wmLate + 1000L))     // 1ms above
    val rows = Seq(
      (9L, 0, m1), (9L, 1, m2), (9L, 2, m2 + hour)) ++
      cases.map { case (u, t) => (u, 2, t) } // new keys in batch 3
    val parts = (0 to 2).map(b =>
      rows.filter(_._2 == b).map(r => (r._1, r._3))
        .toDF("user_id", "us")
        .select(col("user_id"), expr("timestamp_micros(us)").as("ts")))
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
      .writeStream.format("parquet").outputMode("append")
      .option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    q.recentProgress.foreach { pr =>
      val so = pr.stateOperators
      println(s"[repro] batch=${pr.batchId} in=${pr.numInputRows} " +
        s"wm=${pr.eventTime.get("watermark")} " +
        (if (so.nonEmpty) s"lateDrop=${so(0).numRowsDroppedByWatermark}" else ""))
    }
    println(s"[repro] wmLateUs=$wmLate")
    spark.read.parquet(s"$tmp/out").orderBy("user_id").collect().foreach { r =>
      println(s"[repro] user=${r.getLong(0)} ts=${r.getTimestamp(1).getTime}")
    }
    cases.foreach { case (u, t) =>
      println(s"[repro] case user=$u ts=$t wmLate_minus_ts=${wmLate - t}")
    }
    spark.stop()
  }
}
