package graft

import org.apache.spark.sql.functions._

import graft.ops.Behavior

/** Funnel / retention / transitions vs hand cases and a sequential
  * reference implementation on a seeded random event log.
  */
class BehaviorSpec extends SparkSuite {
  import spark.implicits._

  private def evDf(rows: Seq[(Long, Long, Long, String)]) =
    rows.toDF("user_id", "event_id", "us", "event_type")
      .withColumn("ts", expr("timestamp_micros(us)"))

  /** Sequential greedy first-touch funnel walk (the contract's
    * definition), one user at a time.
    */
  private def refFunnel(rows: Seq[(Long, Long, Long, String)],
      steps: Seq[String], w: Long): Map[Long, Seq[Long]] =
    rows.groupBy(_._1).map { case (u, es) =>
      val sorted = es.map(e => (e._3, e._4)).sorted
      val t = Array.fill[Option[Long]](steps.size)(None)
      for ((ts, et) <- sorted) {
        val i = steps.indexOf(et)
        if (i >= 0 && t(i).isEmpty &&
          (i == 0 || t(i - 1).exists(p => ts > p && ts <= p + w)))
          t(i) = Some(ts)
      }
      u -> t.toSeq.map(_.getOrElse(0L))
    }

  test("funnel hand case: window gates each step, non-starters zeroed") {
    val h = 3600000000L // 1 h in µs
    val rows = Seq[(Long, Long, Long, String)](
      // u1 completes all three inside 2 h windows
      (1L, 1L, 0L, "view"), (1L, 2L, h, "click"), (1L, 3L, 2 * h, "purchase"),
      // u2's click lands outside the window → steps stop at 1
      (2L, 4L, 0L, "view"), (2L, 5L, 3 * h, "click"),
      // u3 clicks BEFORE any view → click can't count; purchase w/o click
      (3L, 6L, 0L, "click"), (3L, 7L, h, "view"), (3L, 8L, 2 * h, "purchase"),
      // u4 never enters the funnel types
      (4L, 9L, 0L, "error"))
    val got = Behavior.funnel(evDf(rows), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), 2 * h)
      .orderBy("user_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 0L, h, 2 * h, 3L),
      (2L, 0L, 0L, 0L, 1L),
      (3L, h, 0L, 0L, 1L),
      (4L, 0L, 0L, 0L, 0L)))
  }

  test("funnel matches the sequential reference on a seeded random log") {
    val rnd = new scala.util.Random(42)
    val types = Seq("view", "click", "purchase", "error", "signup")
    val rows = (0 until 600).map { i =>
      ((rnd.nextInt(40) + 1).toLong, i.toLong,
        rnd.nextLong(1000000000L), types(rnd.nextInt(types.size)))
    }
    val steps = Seq("view", "click", "purchase")
    val w = 200000000L
    val got = Behavior.funnel(evDf(rows), "user_id", "ts", "event_type",
        steps, w)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4)).toMap
    val want = refFunnel(rows, steps, w)
    assert(got.keySet === rows.map(_._1).toSet)
    for ((u, ts) <- want) assert(got(u) === ts, s"user $u")
  }

  test("funnel refuses loudly on a hot user past maxEventsPerKey; only step-typed events count") {
    // round-15 per-key fold guard (the Signal.debounce discipline): the
    // per-user collected list is a non-spillable agg buffer; the cap
    // counts what actually enters it — events OUTSIDE the funnel's step
    // types never reach the buffer and must not trip the guard.
    val h = 3600000000L
    val hot = (0 until 30).map(i =>
      (1L, i.toLong, i * h, Seq("view", "click")(i % 2))) ++
      (100 until 140).map(i => (1L, i.toLong, i * h, "error")) :+
      ((2L, 999L, 0L, "view"))
    val steps = Seq("view", "click", "purchase")
    // collect(), not count(): the funnel's left join carries a
    // distinct-keyed right side, so count() lets Catalyst ELIMINATE the
    // join — the fold (and its guard) never runs, which is laziness
    // working as intended; the guard fires when the buffer would build
    val e = intercept[Exception] {
      Behavior.funnel(evDf(hot), "user_id", "ts", "event_type", steps, h,
        maxEventsPerKey = 20).collect()
    }
    val msg = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .take(10).flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(msg.contains("maxEventsPerKey") && msg.contains("Behavior.funnel"),
      msg)
    // cap 30 admits: u1 has exactly 30 STEP-typed events (40 error rows
    // don't count against the buffer the guard protects)
    val ok = Behavior.funnel(evDf(hot), "user_id", "ts", "event_type",
        steps, h, maxEventsPerKey = 30)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(ok.length === 2)
  }

  test("retention: per-user week offsets from the user's own first day") {
    val day = 86400000000L
    val rows = Seq[(Long, Long, Long, String)](
      // A: days 0, 8, 15 → cohort_week 0, offsets 0,1,2
      (1L, 1L, 0L, "x"), (1L, 2L, 8 * day, "x"), (1L, 3L, 15 * day, "x"),
      // B: days 10, 24 → cohort_week 1, offsets 0,2
      (2L, 4L, 10 * day, "x"), (2L, 5L, 24 * day, "x"),
      // C: two events same week as first → single offset-0 row
      (3L, 6L, 1 * day, "x"), (3L, 7L, 2 * day, "x"))
    val got = Behavior.retentionWeekly(evDf(rows), "user_id", "ts")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set(
      (0L, 0L, 2L), // A and C start in week 0
      (0L, 1L, 1L), (0L, 2L, 1L),
      (1L, 0L, 1L), (1L, 2L, 1L)))
  }

  test("rolling 7-day active users: each user counted once per window day") {
    val day = 86400000000L
    val rows = Seq[(Long, Long, Long, String)](
      // u1 active days 0 and 2 (two events on day 2) → active days 0..8
      (1L, 1L, 0L, "x"), (1L, 2L, 2 * day, "x"), (1L, 3L, 2 * day + 5L, "x"),
      // u2 active day 10 → active days 10..16
      (2L, 4L, 10 * day, "x"))
    val got = Behavior.rollingActiveDaily(evDf(rows), "user_id", "ts", 7)
      .as[(Long, Long)].collect().toMap
    val want = ((0L to 8L).map(_ -> 1L) ++ (10L to 16L).map(_ -> 1L)).toMap
    assert(got === want)
    // u1 is never double-counted on days 2..6 (active on both 0 and 2)
    assert(got(3L) === 1L)
  }

  test("transitions: lag per user, ties on ts break by event id") {
    val rows = Seq[(Long, Long, Long, String)](
      (1L, 1L, 0L, "a"), (1L, 2L, 5L, "b"), (1L, 3L, 5L, "c"), // tie: b then c
      (2L, 4L, 0L, "b"))
    val got = Behavior.transitions(evDf(rows), "user_id", "ts",
        "event_type", "event_id")
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(
      ("__start__", "a", 1L), ("a", "b", 1L), ("b", "c", 1L),
      ("__start__", "b", 1L)))
  }

  test("activityStreaks hand case: islands, gaps, multi-event days") {
    import spark.implicits._
    val d = 86400000000L
    // user 1: days 0,1,2 (two events on day 1), gap, days 5,6 -> longest 3, active 5
    // user 2: days 10, 12, 14 (all isolated) -> longest 1, active 3
    // user 3: one day -> longest 1, active 1
    val rows = Seq(
      (1L, 1L, 0L, "a"), (1L, 2L, d + 1L, "a"), (1L, 3L, d + 2L, "b"),
      (1L, 4L, 2 * d, "a"), (1L, 5L, 5 * d, "a"), (1L, 6L, 6 * d, "a"),
      (2L, 7L, 10 * d, "a"), (2L, 8L, 12 * d, "a"), (2L, 9L, 14 * d, "a"),
      (3L, 10L, 3 * d, "a"))
    val got = Behavior.activityStreaks(evDf(rows), "user_id", "ts")
      .orderBy("user_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 3L, 5L), (2L, 1L, 3L), (3L, 1L, 1L)))
  }

  test("scd2Runs hand case: run boundaries, validity chain, is_current") {
    // user 1: a a b a  -> runs (a:2, b:1, a:1); same-ts ties break on id
    // user 2: single event -> one current run
    val rows = Seq(
      (1L, 1L, 100L, "a"), (1L, 2L, 100L, "a"), (1L, 3L, 300L, "b"),
      (1L, 4L, 400L, "a"),
      (2L, 9L, 50L, "x"))
    val got = Behavior.scd2Runs(evDf(rows), "user_id", "ts", "event_type",
        "event_id")
      .orderBy("user_id", "run_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getLong(5),
        r.getBoolean(6)))
      .toSeq
    assert(got === Seq(
      (1L, 1L, "a", 100L, 300L, 2L, false),
      (1L, 2L, "b", 300L, 400L, 1L, false),
      (1L, 3L, "a", 400L, -1L, 1L, true),
      (2L, 1L, "x", 50L, -1L, 1L, true)))
  }

  test("runningDistinctUsers: first-seen decomposition equals brute force") {
    val d = 86400000000L
    val rows = Seq(
      (1L, 1L, 0L, "a"), (2L, 2L, 0L, "a"),          // day 0: users 1,2
      (1L, 3L, d, "a"),                               // day 1: no new user
      (3L, 4L, 3 * d, "a"), (1L, 5L, 3 * d, "a"))     // day 3: user 3 new
    val got = Behavior.runningDistinctUsers(evDf(rows), "user_id", "ts")
      .orderBy("day")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((0L, 2L, 2L), (1L, 0L, 2L), (3L, 1L, 3L)))
  }
}
