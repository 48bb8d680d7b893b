package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStream
import graft.multimodal.Media

/** Streaming-equals-batch equivalence + multimodal plumbing tests. */
class StreamingSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("streaming hourly agg equals batch groupBy on the same data") {
    val streamed = EventStream.runToMemory(spark, s"$sfDir/events.parquet",
      EventStream.hourlyAgg, "t_hourly", OutputMode.Complete)
    val batch = Tables.events(spark, sfDir)
      .groupBy(unix_millis(date_trunc("hour", col("ts"))).as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(graft.functions.Exact.cents(col("value"))).as("sum_value_cents"))
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("streaming funnel state equals the batch funnel fold after a drain") {
    val streamed = EventStream.runToMemory(spark, s"$sfDir/events.parquet",
      df => EventStream.funnelState(spark, df,
        Seq("view", "click", "purchase"), 21600000000L),
      "t_funnel", OutputMode.Update)
    val batch = graft.ops.Behavior.funnel(Tables.events(spark, sfDir),
      "user_id", "ts", "event_type", Seq("view", "click", "purchase"),
      21600000000L)
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("transformWithState session timers: drained output equals the batch rule, boundaries exact") {
    // the TwsTimerProbe fixture, pinned as a spec: trailing sessions whose
    // ms-ceiled close is <= the final watermark (ms-floored max - delay)
    // fire BY TIMER — including the exact-boundary and sub-ms cases —
    // later ones don't; in-batch closures always emit
    val gapUs = 60L * 1000000L
    val delayUs = 600L * 1000000L
    val base = 1700000000L * 1000000L
    val maxUs = base + 3600L * 1000000L
    val wmUs = (maxUs / 1000L - delayUs / 1000L) * 1000L
    val cases = Seq(
      (1L, wmUs - gapUs - 1000000L, true),  // 1s early → fires
      (2L, wmUs - gapUs, true),             // exact boundary → fires
      (3L, wmUs - gapUs + 1000L, false),    // 1ms late → held
      (4L, wmUs - gapUs + 1000000L, false), // 1s late → held
      (5L, wmUs - gapUs - 500L, true))      // sub-ms early (ceil) → fires
    val rows = cases.flatMap { case (u, lastUs, _) =>
      Seq((u * 1000L, lastUs - 3 * gapUs, u), (u * 1000L + 1, lastUs, u))
    } :+ ((99000L, maxUs, 99L))
    import spark.implicits._
    val df = rows.toDF("event_id", "ts_us", "user_id")
      .select(col("event_id"), expr("timestamp_micros(ts_us)").as("ts"),
        col("user_id"), lit("view").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
    val dir = tmpDir("tws_timer")
    graft.io.SingleFile.writeParquetAtomic(df, s"$dir/events.parquet")
    val out = EventStream.runToMemory(spark, s"$dir/events.parquet",
      d => EventStream.sessionTimeouts(spark, d, gapUs, "10 minutes"),
      "t_tws_timer", OutputMode.Append)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSet
    val expected = cases.flatMap { case (u, lastUs, fires) =>
      val first = (u, lastUs - 3 * gapUs, lastUs - 3 * gapUs + gapUs, 1L, "batch")
      if (fires) Seq(first, (u, lastUs, lastUs + gapUs, 1L, "timer"))
      else Seq(first)
    }.toSet // user 99's single trailing session is open → never emitted
    assert(out === expected)
  }

  test("transformWithState modal type equals the batch mode after a drain") {
    val streamed = EventStream.runToMemory(spark, s"$sfDir/events.parquet",
      df => EventStream.userModalType(spark, df), "t_tws", OutputMode.Update)
    val counts = Tables.events(spark, sfDir)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("n").desc, col("event_type"))
    val batch = counts
      .withColumn("r", row_number().over(w))
      .withColumn("n_events", sum("n").over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")))
      .where(col("r") === 1)
      .select(col("user_id"), col("n_events"),
        col("event_type").as("top_type"), col("n").as("top_n"))
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("streaming session windows match batch gaps-and-islands boundaries") {
    val streamed = EventStream.runToMemory(spark, s"$sfDir/events.parquet",
      EventStream.sessionAgg, "t_sess", OutputMode.Complete)
    val batch = graft.ops.Sessionize.sessions(
      Tables.events(spark, sfDir), col("user_id"), col("ts"), col("event_id"),
      gapMicros = 1800000000L)
      .groupBy("user_id", "session_id")
      .agg(min("ts_us").as("session_start_us"),
        (max("ts_us") + 1800000000L).as("session_end_us"),
        count(lit(1)).as("n_events"),
        sum(graft.functions.Exact.cents(col("value"))).as("sum_value_cents"))
      .drop("session_id")
    assert(streamed.count() === batch.count())
    assert(streamed.select(batch.columns.map(col): _*).except(batch).isEmpty)
  }

  test("stateful running user counts process every event exactly once") {
    import spark.implicits._
    val counts = EventStream.runToMemory(spark, s"$sfDir/events.parquet",
      df => EventStream.runningUserCounts(spark, df), "t_counts", OutputMode.Update)
    // Update-mode memory sink keeps every update; the LAST row per user is
    // the final state. Sum of final counts == total events.
    val finalCounts = counts.groupBy("user_id").agg(max("n_events").as("n"))
    val total = finalCounts.agg(sum("n")).head().getLong(0)
    assert(total === Tables.events(spark, sfDir).count())
  }

  test("streaming dedup (both flavors) equals batch DISTINCT") {
    val batch = Tables.events(spark, sfDir)
      .select("user_id", "event_type").distinct()
    val unbounded = EventStream.runToMemory(spark, s"$sfDir/events.parquet",
      df => EventStream.distinctUserEventTypes(df), "t_dedup", OutputMode.Append)
    assert(unbounded.count() === batch.count())
    assert(unbounded.except(batch).isEmpty)
    // watermark-bounded flavor: all events fit inside the bound here, so
    // the result must still be the exact distinct set
    val bounded = EventStream.runToMemory(spark, s"$sfDir/events.parquet",
      df => EventStream.distinctUserEventTypes(df, Some("100 days")),
      "t_dedup_wm", OutputMode.Append)
    assert(bounded.count() === batch.count())
    assert(bounded.except(batch).isEmpty)
  }

  test("flatMapGroupsWithState sessions equal session_window sessions") {
    val viaFmgws = EventStream.sessionsViaFMGWS(spark, Tables.events(spark, sfDir))
    val viaWindow = EventStream.runToMemory(spark, s"$sfDir/events.parquet",
      EventStream.sessionAgg, "t_fmgws_ref", OutputMode.Complete)
    assert(viaFmgws.count() > 0)
    assert(viaFmgws.count() === viaWindow.count())
    val cols = viaFmgws.columns.map(col)
    assert(viaFmgws.except(viaWindow.select(cols: _*)).isEmpty &&
      viaWindow.select(cols: _*).except(viaFmgws).isEmpty)
  }

  test("stream-stream interval join equals the batch theta-join") {
    val streamed = EventStream.runToMemory(spark, s"$sfDir/events.parquet",
      EventStream.clickAttribution, "t_ssjoin", OutputMode.Append)
    val e = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val batch = e.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts_us").as("click_us"))
      .join(e.where(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_id"), col("ts_us").as("view_us")),
        Seq("user_id"))
      .where(col("view_us") <= col("click_us") &&
        col("view_us") >= col("click_us") - 1800000000L)
    assert(streamed.count() > 0)
    assert(streamed.count() === batch.count())
    assert(streamed.select(batch.columns.map(col): _*).except(batch).isEmpty &&
      batch.except(streamed.select(batch.columns.map(col): _*)).isEmpty)
  }

  test("multimodal: synthetic media bytes are 128B, decode features deterministic") {
    val media = Media.syntheticMediaFromDocs(Tables.documents(spark, sfDir))
    val stats = Media.byteStats(media)
    assert(stats.filter(col("n_bytes") =!= 128).count() === 0)
    val f1 = Media.decodeFrames(spark, media).collect()
      .map(d => d.media_id -> d.pixels.toSeq).toMap
    val f2 = Media.decodeFrames(spark, media).collect()
      .map(d => d.media_id -> d.pixels.toSeq).toMap
    assert(f1 === f2)
    assert(f1.values.forall(_.size === 16))
    // different docs → different features (hash-derived)
    assert(f1(0L) !== f1(1L))
  }

  test("multimodal: resize + frame sampling plumbing") {
    val media = Media.syntheticMediaFromDocs(Tables.documents(spark, sfDir))
    val decoded = Media.decodeFrames(spark, media)
    val resized = Media.resizeFeatures(spark, decoded, 4)
    val row = resized.orderBy("media_id").head()
    assert(row.getSeq[Float](2).size === 4)
    // deterministic: same input -> same resized features
    val again = Media.resizeFeatures(spark, Media.decodeFrames(spark, media), 4)
      .orderBy("media_id").head()
    assert(row.getSeq[Float](2) === again.getSeq[Float](2))
    val sampled = Media.sampleFrames(decoded, 2)
    assert(sampled.count() === decoded.count()) // single-frame media: all kept (frame 0)
  }

  test("IVF ANN: recalls the exact top neighbour for most queries") {
    val topExact = graft.ops.Similarity.bruteForceTopK(
      Tables.embeddings(spark, sfDir), "vec_id", "embedding",
      org.apache.spark.sql.functions.col("vec_id") % 50 === 0, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val topIvf = graft.ops.IvfIndex.searchTopK(
      Tables.embeddings(spark, sfDir), "vec_id", "embedding",
      org.apache.spark.sql.functions.col("vec_id") % 50 === 0, 1,
      nCentroids = 8, nProbe = 4, seed = "ivf")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(topIvf.nonEmpty)
    val agree = topExact.keys.count(k => topIvf.get(k).contains(topExact(k)))
    // nProbe=4 of 8 centroids: expect at least half the exact top-1s found
    assert(agree * 2 >= topExact.size, s"IVF recall too low: $agree/${topExact.size}")
  }

  test("multimodal: binaryFile ingestion reads real files") {
    val dir = tmpDir("media_in")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.bin"),
      Array.fill[Byte](64)(7))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.bin"),
      Array.fill[Byte](32)(9))
    val df = Media.readBinaryDir(spark, dir, "*.bin")
    val sizes = df.select(length(col("bytes"))).collect().map(_.getInt(0)).sorted
    assert(sizes.toSeq === Seq(32, 64))
  }
}
