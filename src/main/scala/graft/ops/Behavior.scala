package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-behavior analytics over an event log: ordered-funnel conversion,
  * weekly cohort retention, and first-order (Markov) transition counts —
  * the session-level signals a training-data pipeline computes over its
  * interaction telemetry (reference neura pipeline keeps per-episode event
  * ordering for the same reason; see validate_one.py's monotonic-ts check).
  *
  * Scale contracts shared by all three:
  *  - exactly ONE shuffle keyed on the user (funnel: groupBy; retention:
  *    groupBy; transitions: a user-partitioned window) — the event table is
  *    never re-shuffled per step/week/state, so 100 TB of events move once;
  *  - all time arithmetic is integer microseconds/days (no calendar or
  *    float math), so results replay bit-for-bit on any ANSI engine;
  *  - outputs are tiny (per-user rows or per-bucket counts), never
  *    event-sized.
  */
object Behavior {

  /** Integer `x DIV 7` as a Column — the module's time arithmetic is
    * integer-only by contract, and `transform` lambda variables can't pass
    * through `expr(...)` strings, so build the IntegralDivide node
    * directly (truncation-vs-floor hazards of a double quotient never
    * arise).
    */
  private def intDiv7(x: Column): Column = {
    import org.apache.spark.sql.graft.GraftBridge
    GraftBridge.toColumn(
      new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        GraftBridge.toExpression(x), GraftBridge.toExpression(lit(7L))))
  }

  /** Ordered funnel with a per-step conversion window: step i counts only
    * if its event lands STRICTLY after step i-1's time and within
    * `windowUs` of it. Per user, the earliest qualifying completion is
    * taken greedily in event-time order (the classic "first touch" funnel
    * contract — deterministic, and replayable in SQL as a chain of
    * windowed MIN CTEs).
    *
    * One groupBy(user) shuffle; each user's (ts, type) pairs — projected
    * down to the funnel's own event types first — are sorted and folded
    * with a higher-order aggregate (per-row work, no per-step join or
    * re-shuffle). Emits one row per DISTINCT user in `events` (funnel
    * non-starters included with zeroed times): (user, t0_us..tk_us epoch
    * micros — 0 where the step was never reached — and steps_completed).
    *
    * The per-user collected list is a non-spillable aggregation buffer, so
    * users past `maxEventsPerKey` STEP-TYPED events refuse loudly before
    * the buffer builds ([[graft.ops.Signal]]'s guard — rides the same
    * user exchange; the fold needs every step event, so the guard refuses
    * rather than truncates).
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], windowUs: Long,
      maxEventsPerKey: Int = Signal.DefaultMaxEventsPerKey): DataFrame = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      s"funnel steps must be non-empty and distinct: $steps")
    val nullT = lit(null).cast("bigint")
    val init = struct(steps.indices.map(i => nullT.as(s"t$i")): _*)
    val stepEvents = events
      .where(col(typeCol).isin(steps: _*))
      .select(col(userCol),
        struct(unix_micros(col(tsCol)).as("ts_us"), col(typeCol).as("et"))
          .as("_e"))
    val folded = Signal.guardEventsPerKey(stepEvents, Seq(userCol),
        maxEventsPerKey, "Behavior.funnel")
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(col("_e"))).as("evs"))
      .withColumn("_f", aggregate(col("evs"), init, (acc, ev) => {
        val ts = ev.getField("ts_us")
        val et = ev.getField("et")
        // Each event can fire at most one branch (step types are distinct),
        // and step i gates on the UPDATED step i-1 time so a click later in
        // the same fold sees the view that opened its window; the strict
        // `>` keeps a same-microsecond pair from double-counting one event.
        var prev: Column = null
        val fields = steps.zipWithIndex.map { case (st, i) =>
          val cur = acc.getField(s"t$i")
          val open =
            if (i == 0) lit(true)
            else prev.isNotNull && ts > prev && ts <= prev + lit(windowUs)
          val nt = when(cur.isNull && et === lit(st) && open, ts).otherwise(cur)
          prev = nt
          nt.as(s"t$i")
        }
        struct(fields: _*)
      }))
    val users = events.select(col(userCol)).distinct()
    val stepCols = steps.indices.map(i =>
      coalesce(col("_f").getField(s"t$i"), lit(0L)).as(s"t${i}_us"))
    val completed = steps.indices
      .map(i => when(col("_f").getField(s"t$i").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    users.join(folded, Seq(userCol), "left")
      .select(col(userCol) +: stepCols :+
        coalesce(completed, lit(0L)).as("steps_completed"): _*)
  }

  /** Weekly cohort retention: users bucketed by the week of their FIRST
    * event (absolute week index = epoch-day DIV 7 — pure integer, no
    * calendar), counted once per later week they return. No self-join:
    * one groupBy(user) collects each user's distinct active days, the
    * distinct week OFFSETS are derived per row from the user's own min
    * day, and a second small groupBy counts users per (cohort, offset).
    * The (user, offset) pairs are distinct by construction, so the final
    * count is a plain count, never a countDistinct shuffle of event rows.
    */
  def retentionWeekly(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val perUser = events
      // integer DIV, not float division: a float quotient at an exact day
      // boundary is a correctness hazard, not a style choice
      .select(col(userCol),
        expr(s"unix_micros($tsCol) DIV 86400000000").as("_day"))
      .groupBy(col(userCol))
      .agg(min(col("_day")).as("_d0"), collect_set(col("_day")).as("_days"))
      .select(col(userCol), expr("_d0 DIV 7").as("cohort_week"),
        explode(array_distinct(
          transform(col("_days"), d => intDiv7(d - col("_d0")))))
          .as("week_offset"))
    perUser.groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Trailing N-day active users (the WAU/MAU curve): for each day,
    * distinct users with ≥1 event in [day−N+1, day]. Exact, via bounded
    * explode: distinct (user, day) pairs (one groupBy) each project into
    * the N target days they keep the user active in, then a second
    * distinct + count. Shuffle volume is N × the distinct activity table
    * (users × active days), never N × the raw event log. Target days run
    * through lastActiveDay+N−1 — the window trails until the last
    * activity ages out.
    */
  def rollingActiveDaily(events: DataFrame, userCol: String, tsCol: String,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1: $windowDays")
    events
      .select(col(userCol),
        expr(s"unix_micros($tsCol) DIV 86400000000").as("_day"))
      .distinct()
      .select(col(userCol),
        explode(sequence(col("_day"), col("_day") + (windowDays - 1)))
          .as("day"))
      .distinct()
      .groupBy("day")
      .agg(count(lit(1)).as("n_active"))
  }

  /** Longest consecutive-day activity streak per user — the classic
    * gaps-and-islands fold (engagement/retention signal; the reference
    * keeps per-episode day ordering for the same monotonic-ts reason,
    * validate_one.py). Island id = day − row_number(day): constant within
    * a run of consecutive days, strictly decreasing across a gap.
    *
    * Scale contract: one distinct on (user, day) — activity-table sized,
    * never event-sized — then a user-partitioned window (parallelism =
    * users; a user's distinct days are bounded by the calendar, so no key
    * serializes a task) and two aggregations over activity-table-sized
    * input. All arithmetic is integer days: bit-exact on any ANSI
    * engine. Output is one tiny row per user.
    */
  def activityStreaks(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val byUserDay = Window.partitionBy(col(userCol)).orderBy(col("_day"))
    events
      .select(col(userCol),
        expr(s"unix_micros($tsCol) DIV 86400000000").as("_day"))
      .distinct()
      .withColumn("_grp", col("_day") - row_number().over(byUserDay))
      .groupBy(col(userCol), col("_grp"))
      .agg(count(lit(1)).as("_len"))
      .groupBy(col(userCol))
      .agg(max("_len").as("longest_streak"),
        sum("_len").as("n_active_days"))
  }

  /** Running distinct users per active day — cumulative audience size
    * over time. The scalable rewrite of `COUNT(DISTINCT user) OVER
    * (ORDER BY day)` (which no engine can window without holding the set):
    * distinct is a PER-USER min-day aggregate, the running count is a
    * cumulative SUM of per-day first-seen counts — counting distincts
    * becomes summing integers. The final window runs over the DAY table
    * (calendar-bounded, thousands of rows at any corpus size), so the
    * single-partition window is a non-issue; everything event-sized is
    * keyed aggregation with map-side combine.
    */
  def runningDistinctUsers(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val day = expr(s"unix_micros($tsCol) DIV 86400000000")
    val activeDays = events.select(day.as("day")).distinct()
    val newPerDay = events
      .select(col(userCol), day.as("_day"))
      .groupBy(col(userCol)).agg(min("_day").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_new"))
    // partition-less window over the DAY GRID (one row per distinct day —
    // bounded by the calendar, not the event log), never the raw events
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    activeDays.join(newPerDay, Seq("day"), "left")
      .select(col("day"), coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("cum_users", sum("n_new").over(w))
  }

  /** SCD2 (slowly-changing-dimension type 2) build: collapse each user's
    * event-time-ordered stream into validity intervals of CONSECUTIVE
    * same-value runs — the dimension-table form of change history
    * (`valid_from` inclusive, `valid_to` = next run's start, NULL while
    * current). The classic warehouse op a training-data pipeline uses to
    * attach "what was this user's state AT the example's event time"
    * without leaking future state.
    *
    * Run boundaries: value != lag(value) (first row starts run 1); run id
    * is the cumulative boundary count — one user-partitioned window pass,
    * one groupBy, one lead(). Order key (tsCol, idCol) is total, so runs
    * are deterministic. Scale: parallelism = users, output = runs (≪
    * events); all integer-µs arithmetic.
    */
  def scd2Runs(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, idCol: String): DataFrame = {
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col("_ts_us"), col(idCol))
    val byUserRun = Window.partitionBy(col(userCol)).orderBy(col("_run"))
    events
      .select(col(userCol), col(idCol), col(valueCol).as("_v"),
        expr(s"unix_micros($tsCol)").as("_ts_us"))
      .withColumn("_chg",
        when(lag(col("_v"), 1).over(byUser).isNull ||
          lag(col("_v"), 1).over(byUser) =!= col("_v"), 1L).otherwise(0L))
      .withColumn("_run", sum(col("_chg")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("_run"))
      .agg(first(col("_v")).as(valueCol), min(col("_ts_us")).as("valid_from_us"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(byUserRun))
      .withColumn("is_current", col("valid_to_us").isNull)
      .select(col(userCol), col("_run").as("run_id"), col(valueCol),
        col("valid_from_us"), col("valid_to_us"), col("n_events"),
        col("is_current"))
  }

  /** First-order transition counts: how often event type A is immediately
    * followed by type B within a user's event-time-ordered stream (the
    * Markov-chain sufficient statistic behind next-action models and
    * anomaly scores). `__start__` rows count each user's first event.
    * One user-partitioned lag window (distributes across users) plus one
    * tiny |types|² aggregation; ties on ts break by `idCol` so the order —
    * and therefore every count — is deterministic.
    */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("_ts_us"), col(idCol))
    events
      .select(col(userCol), col(idCol), col(typeCol),
        unix_micros(col(tsCol)).as("_ts_us"))
      .withColumn("_prev", lag(col(typeCol), 1).over(w))
      .groupBy(coalesce(col("_prev"), lit("__start__")).as("from_type"),
        col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
  }
}
