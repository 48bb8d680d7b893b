package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical probe for transformWithState event-time timer semantics
  * under a one-shot AvailableNow drain (pins the q183 oracle contract):
  * which trailing sessions' timers fire given the final watermark, and
  * with what boundary comparison. Synthetic users place their last event
  * so that `last + gap` lands just below / exactly at / just above the
  * drain's final watermark.
  */
object TwsTimerProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val gapUs = 60L * 1000000L        // 1 min gap
    val delay = "10 minutes"          // watermark delay
    val delayUs = 600L * 1000000L
    val base = 1700000000L * 1000000L // some epoch micros
    val maxUs = base + 3600L * 1000000L // user 99 sets the global max ts
    // final watermark (expected): floor(maxUs/1000)*1000? Spark tracks ms:
    val wmUs = (maxUs / 1000L - delayUs / 1000L) * 1000L
    // trailing-session close (last + gap) relative to watermark:
    val cases = Seq(
      (1L, wmUs - gapUs - 1000000L), // closes 1s BEFORE wm → must fire
      (2L, wmUs - gapUs),            // closes exactly AT wm → boundary
      (3L, wmUs - gapUs + 1000L),    // closes 1ms after wm (ceil-ms bnd)
      (4L, wmUs - gapUs + 1000000L), // closes 1s after wm → must NOT fire
      (5L, wmUs - gapUs - 500L)      // closes 0.5ms before wm (sub-ms)
    )
    // each user: two events 2*gap apart → first session closes in-batch,
    // second is the trailing one with last = the case's target
    val rows = cases.flatMap { case (u, lastUs) =>
      Seq((u * 1000L, lastUs - 3 * gapUs, u), (u * 1000L + 1, lastUs, u))
    } :+ ((99000L, maxUs, 99L))
    import spark.implicits._
    val df = rows.toDF("event_id", "ts_us", "user_id")
      .select(col("event_id"), expr("timestamp_micros(ts_us)").as("ts"),
        col("user_id"), lit("view").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
    val dir = java.nio.file.Files.createTempDirectory("twsprobe").toString
    graft.io.SingleFile.writeParquetAtomic(df, s"$dir/events.parquet")
    val out = graft.streaming.EventStream.runToMemory(spark,
      s"$dir/events.parquet",
      d => graft.streaming.EventStream.sessionTimeouts(spark, d, gapUs, delay),
      "twsprobe", org.apache.spark.sql.streaming.OutputMode.Append)
    println(s"[probe] wmUs(expected)=$wmUs maxUs=$maxUs")
    out.orderBy("user_id", "session_start_us").collect().foreach { r =>
      println(s"[probe] user=${r.getLong(0)} start=${r.getLong(1)} " +
        s"end=${r.getLong(2)} n=${r.getLong(3)} by=${r.getString(4)}")
    }
    cases.foreach { case (u, lastUs) =>
      println(s"[probe] case user=$u trailing_close=${lastUs + gapUs} " +
        s"wm_minus_close=${wmUs - (lastUs + gapUs)}")
    }
    spark.stop()
  }
}
