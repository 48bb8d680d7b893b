package graft

import org.apache.spark.sql.functions._

import graft.ops.{Intervals, Signal}

/** Interval merge sweep, debounce kept-state fold, and the EWMA fold vs
  * hand cases and sequential references.
  */
class IntervalsSignalSpec extends SparkSuite {
  import spark.implicits._

  test("interval merge: overlap chains, touching merges, gaps split") {
    val rows = Seq(
      ("a", 0L, 10L), ("a", 5L, 12L), ("a", 12L, 15L), // chain incl. touch
      ("a", 20L, 25L),                                 // gap → new group
      ("b", 0L, 1L), ("b", 3L, 4L),                    // disjoint
      ("b", 9L, 5L))                                   // degenerate, dropped
    val got = Intervals.merge(rows.toDF("k", "lo", "hi"), "k",
        col("lo"), col("hi"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("a", 0L, 15L, 3L), ("a", 20L, 25L, 1L),
      ("b", 0L, 1L, 1L), ("b", 3L, 4L, 1L)))
  }

  test("interval merge matches a sequential sweep on a seeded random set") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 400).map { _ =>
      val lo = rnd.nextLong(1000L)
      (Seq("x", "y")(rnd.nextInt(2)), lo, lo + rnd.nextLong(30L))
    }
    def ref(iv: Seq[(Long, Long)]): Seq[(Long, Long, Long)] = {
      val s = iv.sorted
      s.tail.foldLeft(Vector((s.head._1, s.head._2, 1L))) {
        case (acc, (lo, hi)) =>
          val (mlo, mhi, n) = acc.last
          if (lo > mhi) acc :+ ((lo, hi, 1L))
          else acc.init :+ ((mlo, math.max(mhi, hi), n + 1))
      }
    }
    val got = Intervals.merge(rows.toDF("k", "lo", "hi"), "k",
        col("lo"), col("hi"))
      .as[(String, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3, r._4)).sorted.toSeq).toMap
    val want = rows.groupBy(_._1).view
      .mapValues(v => ref(v.map(r => (r._2, r._3))).sorted).toMap
    assert(got === want)
  }

  test("debounce keeps first and gap-from-KEPT events only") {
    // ts 0, 3, 6, 14 with tol 5: keep 0 (first), drop 3 (3-0≤5),
    // keep 6 (6-0>5), drop 14? 14-6>5 → keep. Sessionize would differ.
    val rows = Seq((1L, "a", 0L, 10L), (1L, "a", 3L, 11L), (1L, "a", 6L, 12L),
      (1L, "a", 14L, 13L))
    val df = rows.toDF("u", "t", "ts_us", "id")
    val got = Signal.debounce(df, Seq("u", "t"), col("ts_us"), col("id"), 5L)
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, "a", 4L, 3L, 0L, 14L)))
  }

  test("debounce and ewma match sequential references on a random log") {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 500).map { i =>
      ((rnd.nextInt(20) + 1).toLong, rnd.nextLong(300L), i.toLong,
        math.rint(rnd.nextDouble() * 500) / 100.0)
    }
    val df = rows.toDF("u", "ts_us", "id", "v")
    val byUser = rows.groupBy(_._1).view
      .mapValues(_.map(r => (r._2, r._3, r._4)).sorted.toSeq).toMap

    val gotD = Signal.debounce(df, Seq("u"), col("ts_us"), col("id"), 25L)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    for ((u, evs) <- byUser) {
      val kept = evs.tail.foldLeft(Vector(evs.head._1)) { (acc, e) =>
        if (e._1 - acc.last > 25L) acc :+ e._1 else acc }
      assert(gotD(u) === ((evs.size.toLong, kept.size.toLong,
        kept.head, kept.last)), s"user $u")
    }

    val gotE = Signal.ewma(df, Seq("u"), col("ts_us"), col("id"), col("v"),
        alphaPermille = 200)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    for ((u, evs) <- byUser) {
      val want = evs.map(_._3).reduceLeft((a, b) => a + 0.2 * (b - a))
      assert(gotE(u) === want, s"user $u") // bit-exact, same IEEE sequence
    }
  }

  test("debounce/ewma refuse loudly on a hot key past maxEventsPerKey; override admits") {
    // round-15: the per-key full-history fold's collected list is a
    // NON-SPILLABLE aggregation buffer (the invertedIndex/q60 hazard class
    // closed in r14), so a bot account with 10^8 events must refuse with a
    // NAMED error before the buffer builds — a scaladoc contract alone is
    // an executor OOM at corpus scale. The guard rides the same exchange
    // (window count on the groupBy key).
    val rows = (0 until 50).map(i => (1L, i.toLong * 10, i.toLong, 1.0)) :+
      ((2L, 0L, 99L, 1.0))
    val df = rows.toDF("u", "ts_us", "id", "v")
    val eD = intercept[Exception] {
      Signal.debounce(df, Seq("u"), col("ts_us"), col("id"), 5L,
        maxEventsPerKey = 20).count()
    }
    val msgD = Iterator.iterate[Throwable](eD)(_.getCause).takeWhile(_ != null)
      .take(10).flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(msgD.contains("maxEventsPerKey") && msgD.contains("Signal.debounce")
      && msgD.contains("upstream"), msgD)
    val eE = intercept[Exception] {
      Signal.ewma(df, Seq("u"), col("ts_us"), col("id"), col("v"), 200,
        maxEventsPerKey = 20).count()
    }
    val msgE = Iterator.iterate[Throwable](eE)(_.getCause).takeWhile(_ != null)
      .take(10).flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(msgE.contains("maxEventsPerKey") && msgE.contains("Signal.ewma"),
      msgE)
    // a wide-enough cap admits and the fold result is unchanged
    val ok = Signal.debounce(df, Seq("u"), col("ts_us"), col("id"), 5L,
        maxEventsPerKey = 64)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (u, a, b, c, d) => u -> ((a, b, c, d)) }.toMap
    assert(ok(1L)._1 === 50L && ok(2L)._1 === 1L)
  }

  test("the per-key guard shares the groupBy exchange: exactly one shuffle") {
    // the guard must not add a second shuffle of the event table — the
    // window's partitionBy matches the groupBy key, so ONE hash exchange
    // feeds window → filter → aggregate
    val df = (0 until 100).map(i => ((i % 5).toLong, i.toLong, i.toLong))
      .toDF("u", "ts_us", "id")
    val plan = Signal.debounce(df, Seq("u"), col("ts_us"), col("id"), 5L)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected 1 hash exchange, got $exchanges:\n$plan")
  }
}
