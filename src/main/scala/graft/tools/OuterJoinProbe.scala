package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** Empirical probe for stream-stream LEFT OUTER join null-emission.
  *
  * Finding 1 (single-batch drain): NO null row ever emits — the
  * watermark for batch N is computed from data seen through batch N−1,
  * state eviction (which is what emits outer nulls) therefore runs one
  * batch BEHIND, and an AvailableNow drain of one file ends before any
  * eviction batch exists. Outer nulls are a MULTI-BATCH phenomenon.
  *
  * Finding 2: the eviction watermark is the MIN of BOTH sides'
  * watermarks — without late CLICKS the click-side watermark pins the
  * global one back and no view is ever provably unmatchable (the first
  * version of this fixture emitted zero nulls for exactly that reason).
  *
  * Finding 3 (boundary, 7 cases incl. sub-ms): an unmatched view emits
  * iff `v_us <= (wm_ms − windowMs − 1) · 1000` — Spark subtracts the
  * interval upper bound AND one extra ms from the ms-grained watermark.
  *
  * Finding 4 (on the full events table, q199): after the data batches,
  * the engine runs a final NO-DATA batch whose eviction uses the
  * FULL-data watermark — so the per-batch thresholds are subsumed and
  * the batch split drops out of the oracle: emitted nulls = globally
  * unmatched views under the full-data watermark rule of finding 3.
  *
  * This probe pins findings 2–3 on the two-batch shape: file 1 (even
  * event_ids) drains first, file 2 (odd ids) follows in a second
  * micro-batch; file-2 clicks still match file-1 views (eviction runs
  * after each batch's join).
  */
object OuterJoinProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val winUs = 1800L * 1000000L
    val delayUs = 7200L * 1000000L
    val base = 1700000000L * 1000000L
    val max1Us = base + 86400L * 1000000L // file-1 max (even id)
    val wm1Us = (max1Us / 1000L - delayUs / 1000L) * 1000L
    // unmatched views (EVEN ids → file 1), window end placed around wm1:
    val cases = Seq(
      (1L, wm1Us - winUs - 60000000L), // ends 1min before wm1
      (2L, wm1Us - winUs),             // ends exactly at wm1
      (3L, wm1Us - winUs + 1000L),     // ends 1ms after wm1
      (4L, wm1Us - winUs + 60000000L), // ends 1min after wm1
      (5L, wm1Us - winUs - 500L),      // ends 0.5ms before wm1
      (6L, wm1Us - winUs - 2000L),     // ends 2ms before wm1
      (7L, wm1Us - winUs - 1000L))     // ends 1ms before wm1
    val rows =
      cases.map { case (u, v) => (u * 10L, v, u, "view") } ++ Seq(
        (500L, base, 50L, "view"),                 // file 1 view…
        (501L, base + 60000000L, 50L, "click"),    // …file 2 click (odd id)
        (600L, base + 5000000L, 60L, "view"),      // file-1 view matched by
        (602L, base + 6000000L, 60L, "click"),     // file-1 click (even id)
        (990L, max1Us, 99L, "view"),               // file-1 max ts setter
        // file-1 CLICK max-setter: the join evicts on the MIN of both
        // sides' watermarks — without late clicks the click watermark
        // pins the global one 22h back and nothing ever evicts (the
        // first probe finding)
        (992L, max1Us, 96L, "click"),
        (991L, max1Us + 3600L * 1000000L, 98L, "view")) // file-2 later view
    import spark.implicits._
    val df = rows.toDF("event_id", "ts_us", "user_id", "event_type")
      .select(col("event_id"), expr("timestamp_micros(ts_us)").as("ts"),
        col("user_id"), col("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
    val tmp = java.nio.file.Files.createTempDirectory("ojprobe2").toString
    val inDir = s"$tmp/in"
    val ckpt = s"$tmp/ckpt"
    graft.io.SingleFile.writeParquetAtomic(
      df.filter(col("event_id") % 2 === 0), s"$inDir/part1.parquet")
    Thread.sleep(1100) // distinct mtimes: file order = batch order
    graft.io.SingleFile.writeParquetAtomic(
      df.filter(col("event_id") % 2 === 1), s"$inDir/part2.parquet")
    def transform(d: org.apache.spark.sql.DataFrame) = {
      val views = d.where(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
          col("event_id").as("view_id"))
        .withWatermark("v_ts", "2 hours")
      val clicks = d.where(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("click_id"))
        .withWatermark("c_ts", "2 hours")
      views.join(clicks,
        col("v_user") === col("c_user") &&
          col("c_ts") >= col("v_ts") &&
          col("c_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"),
        "left_outer")
        .select(col("v_user").as("user_id"), col("view_id"),
          col("click_id"), unix_micros(col("v_ts")).as("view_us"))
    }
    val schema = graft.streaming.EventStream.eventSchema
    val tsType = spark.read.parquet(s"$inDir/part1.parquet").schema("ts").dataType
    val outDir = s"$tmp/out"
    def drain(): Unit = {
      val stream = spark.readStream
        .schema(StructType(schema.fields.map(f =>
          if (f.name == "ts") f.copy(dataType = tsType) else f)))
        .option("maxFilesPerTrigger", "1")
        .parquet(inDir)
      val q = transform(stream).writeStream
        .format("parquet")
        .outputMode(OutputMode.Append)
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    println(s"[probe] wm1Us=$wm1Us")
    val all = spark.read.parquet(outDir)
    all.orderBy("user_id", "view_us").collect().foreach { r =>
      println(s"[probe] user=${r.getLong(0)} view=${r.getLong(1)} " +
        s"click=${if (r.isNullAt(2)) "NULL" else r.getLong(2)} " +
        s"view_us=${r.getLong(3)}")
    }
    cases.foreach { case (u, v) =>
      println(s"[probe] case user=$u window_end=${v + winUs} " +
        s"wm1_minus_end=${wm1Us - (v + winUs)}")
    }
    // ---- full-outer click-side boundary: unmatched CLICKS (even ids)
    // placed so c_ts sits around wm1. A click matches views with v_ts in
    // [c_ts − 30min, c_ts]; it is provably unmatchable once the VIEW
    // watermark passes c_ts — predicted rule c_us ≤ (wm_ms − 1) · 1000.
    val ccases = Seq(
      (11L, wm1Us - 60000000L), // 1min before wm1
      (12L, wm1Us),             // exactly at wm1
      (13L, wm1Us + 1000L),     // 1ms after
      (14L, wm1Us - 500L),      // 0.5ms before
      (15L, wm1Us - 1000L),     // 1ms before
      (16L, wm1Us - 2000L))     // 2ms before
    val rows2 = ccases.map { case (u, t) => (u * 10L, t, u, "click") } ++ Seq(
      (500L, base, 50L, "view"), (501L, base + 60000000L, 50L, "click"),
      (990L, max1Us, 99L, "view"),
      (992L, max1Us, 96L, "click"),
      (991L, max1Us + 3600L * 1000000L, 98L, "view"))
    val df2 = rows2.toDF("event_id", "ts_us", "user_id", "event_type")
      .select(col("event_id"), expr("timestamp_micros(ts_us)").as("ts"),
        col("user_id"), col("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
    val tmp2 = java.nio.file.Files.createTempDirectory("ojprobe3").toString
    graft.io.SingleFile.writeParquetAtomic(
      df2.filter(col("event_id") % 2 === 0), s"$tmp2/in/part1.parquet")
    Thread.sleep(1100)
    graft.io.SingleFile.writeParquetAtomic(
      df2.filter(col("event_id") % 2 === 1), s"$tmp2/in/part2.parquet")
    val stream2 = spark.readStream
      .schema(StructType(schema.fields.map(f =>
        if (f.name == "ts") f.copy(dataType = tsType) else f)))
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp2/in")
    def transformFull(d: org.apache.spark.sql.DataFrame) = {
      val views = d.where(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
          col("event_id").as("view_id"))
        .withWatermark("v_ts", "2 hours")
      val clicks = d.where(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("click_id"))
        .withWatermark("c_ts", "2 hours")
      views.join(clicks,
        col("v_user") === col("c_user") &&
          col("c_ts") >= col("v_ts") &&
          col("c_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"),
        "full_outer")
        .select(coalesce(col("v_user"), col("c_user")).as("user_id"),
          col("view_id"), col("click_id"))
    }
    val q2 = transformFull(stream2).writeStream
      .format("parquet").outputMode(OutputMode.Append)
      .option("path", s"$tmp2/out")
      .option("checkpointLocation", s"$tmp2/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    println(s"[probe] FULL outer results (wm1Us=$wm1Us):")
    spark.read.parquet(s"$tmp2/out").orderBy("user_id").collect().foreach { r =>
      println(s"[probe] user=${r.getLong(0)} view=" +
        s"${if (r.isNullAt(1)) "NULL" else r.getLong(1)} click=" +
        s"${if (r.isNullAt(2)) "NULL" else r.getLong(2)}")
    }
    ccases.foreach { case (u, t) =>
      println(s"[probe] ccase user=$u c_us=$t wm1_minus_c=${wm1Us - t}")
    }
    org.apache.spark.sql.graft.GraftBridge.stopStateStore()
    spark.stop()
  }
}
