package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.TimeSeries

/** Gap-fill + forward fill vs hand-built expectations. */
class TimeSeriesSpec extends SparkSuite {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00")

  test("per-key spine, zero-filled gaps, forward-filled values") {
    val events = Seq(
      ("a", ts(1, 10), 100L), ("a", ts(1, 40), 50L), // hour 1: n=2, v=150
      ("a", ts(4, 5), 30L),                          // hours 2,3 silent
      ("b", ts(2, 0), 7L)                            // single-hour key
    ).toDF("k", "t", "v")
    val got = TimeSeries.gapFillHourly(events, "k", "t", sum("v"), "v")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getLong(2), r.getLong(3)))
      .toSet
    val want = Set(
      ("a", "2024-03-01 01:00:00.0", 2L, 150L),
      ("a", "2024-03-01 02:00:00.0", 0L, 150L), // gap, ffill
      ("a", "2024-03-01 03:00:00.0", 0L, 150L), // gap, ffill
      ("a", "2024-03-01 04:00:00.0", 1L, 30L),
      ("b", "2024-03-01 02:00:00.0", 1L, 7L))
    assert(got === want)
  }

  test("keys never cross-contaminate and spine is per-key bounded") {
    val events = Seq(("x", ts(0), 1L), ("x", ts(23), 2L), ("y", ts(10), 9L))
      .toDF("k", "t", "v")
    val got = TimeSeries.gapFillHourly(events, "k", "t", sum("v"), "v")
    assert(got.where(col("k") === "x").count() === 24)
    assert(got.where(col("k") === "y").count() === 1)
    // y's value never leaks into x's fill
    assert(got.where(col("k") === "x" && col("filled_v") === 9L).count() === 0)
  }

  test("amplification cap: a corrupt epoch-0 timestamp refuses loudly instead of densifying") {
    // round-13 RangeJoin-pattern cap: one 1970 row against 2024 data
    // would otherwise explode the key's spine by ~470k hourly rows
    val events = Seq(
      ("a", java.sql.Timestamp.valueOf("1970-01-01 00:00:00"), 1L),
      ("a", ts(1, 0), 2L)).toDF("k", "t", "v")
    val e = intercept[Exception] {
      TimeSeries.gapFillHourly(events, "k", "t", sum("v"), "v").count()
    }
    val msg = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .take(10).flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(msg.contains("maxSpanHours"), msg)
    // override admits the wide span
    assert(TimeSeries.gapFillHourly(events, "k", "t", sum("v"), "v",
      maxSpanHours = 600000L).count() > 400000L)
  }

  test("all-NULL-timestamp key passes through the span cap, not into the raise") {
    // round-14 advice: lo=hi=NULL makes span NULL, and when(NULL <= cap)
    // is not-true — without the isNull arm the key crashed with a
    // misleading "spans null hours" raise. Contract: such a key produces
    // NO spine rows (sequence(NULL,NULL) is NULL, explode drops it),
    // exactly the pre-cap behavior; healthy keys are unaffected.
    val events = Seq(
      ("dead", null.asInstanceOf[Timestamp], 1L),
      ("dead", null.asInstanceOf[Timestamp], 2L),
      ("live", ts(3, 0), 5L)).toDF("k", "t", "v")
    val got = TimeSeries.gapFillHourly(events, "k", "t", sum("v"), "v")
    assert(got.where(col("k") === "dead").count() === 0L)
    assert(got.where(col("k") === "live").count() === 1L)
  }
}
