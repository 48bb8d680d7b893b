package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Behavior

/** Behavioral analytics over the event log: ordered-funnel conversion,
  * weekly cohort retention, and first-order transition counts — the
  * telemetry views a data-pipeline team runs next to the corpus itself
  * (reference keeps episode event ordering for the same reason its
  * validate stage checks ts monotonicity; validate_one.py:61-74).
  *
  * Every gate's time arithmetic is integer micros/days (epoch_us on both
  * engines), so the hashes are engine-portable; each pipeline shuffles the
  * event table exactly once, on the user key.
  */
object BehaviorQueries {

  private val FunnelWindowUs = 6L * 3600 * 1000000 // 6 h per-step window

  /** view → click → purchase funnel with a 6-hour per-step conversion
    * window, first-touch (earliest-qualifying) semantics. The oracle
    * replays the greedy walk as a chain of windowed-MIN CTEs — provably
    * the same result as the engine's per-user sorted fold, since both take
    * the earliest qualifying event per step. Non-starters appear with
    * zeroed times, so the row count is the full user universe.
    */
  val q168Funnel: Q = Q(
    "q168_funnel",
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type
       |  FROM events
       |), s0 AS (
       |  SELECT user_id, min(ts_us) AS t0 FROM e
       |  WHERE event_type = 'view' GROUP BY 1
       |), s1 AS (
       |  SELECT e.user_id, min(ts_us) AS t1 FROM e JOIN s0 USING (user_id)
       |  WHERE event_type = 'click' AND ts_us > t0
       |    AND ts_us <= t0 + $FunnelWindowUs GROUP BY 1
       |), s2 AS (
       |  SELECT e.user_id, min(ts_us) AS t2 FROM e JOIN s1 USING (user_id)
       |  WHERE event_type = 'purchase' AND ts_us > t1
       |    AND ts_us <= t1 + $FunnelWindowUs GROUP BY 1
       |)
       |SELECT u.user_id, coalesce(t0, 0) AS t0_us, coalesce(t1, 0) AS t1_us,
       |  coalesce(t2, 0) AS t2_us,
       |  CAST(CAST(t0 IS NOT NULL AS BIGINT) + CAST(t1 IS NOT NULL AS BIGINT)
       |    + CAST(t2 IS NOT NULL AS BIGINT) AS BIGINT) AS steps_completed
       |FROM (SELECT DISTINCT user_id FROM e) u
       |LEFT JOIN s0 USING (user_id) LEFT JOIN s1 USING (user_id)
       |LEFT JOIN s2 USING (user_id)
       |ORDER BY user_id""".stripMargin) { (s, dir) =>
    Behavior.funnel(Tables.events(s, dir), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), FunnelWindowUs)
      .orderBy("user_id")
  }

  /** Weekly cohort retention matrix: users keyed by the absolute week of
    * their first event, counted once per week-offset they return in. Pure
    * integer day/week math on both engines.
    */
  val q169CohortRetention: Q = Q(
    "q169_cohort_retention",
    """WITH e AS (
      |  SELECT user_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
      |  FROM events
      |), f AS (SELECT user_id, min(day) AS d0 FROM e GROUP BY 1),
      |o AS (
      |  SELECT DISTINCT e.user_id, f.d0 // 7 AS cohort_week,
      |    (e.day - f.d0) // 7 AS week_offset
      |  FROM e JOIN f USING (user_id)
      |)
      |SELECT cohort_week, week_offset, count(*) AS n_users
      |FROM o GROUP BY 1, 2
      |ORDER BY cohort_week, week_offset""".stripMargin) { (s, dir) =>
    Behavior.retentionWeekly(Tables.events(s, dir), "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
  }

  /** First-order (Markov) transition counts between consecutive event
    * types per user, `__start__` marking each user's first event; ties on
    * ts break on event_id so both engines walk the identical sequence.
    */
  val q170Transitions: Q = Q(
    "q170_transitions",
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      |  FROM events
      |), l AS (
      |  SELECT user_id, event_type, lag(event_type) OVER (
      |    PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
      |  FROM e
      |)
      |SELECT coalesce(prev, '__start__') AS from_type,
      |  event_type AS to_type, count(*) AS n
      |FROM l GROUP BY 1, 2
      |ORDER BY from_type, to_type""".stripMargin) { (s, dir) =>
    Behavior.transitions(Tables.events(s, dir), "user_id", "ts",
        "event_type", "event_id")
      .orderBy("from_type", "to_type")
  }

  /** Item co-occurrence counts (the item2vec / SPPMI statistic) over the
    * props.k item id, with the per-user quadratic capped at the 40
    * most-interacted items (count desc, item asc — deterministic and
    * replayed by the oracle's row_number). One groupBy, one rank filter,
    * one user-keyed self-join, one pair aggregation.
    */
  val q173Cooccurrence: Q = Q(
    "q173_cooccurrence",
    """WITH ui AS (
      |  SELECT user_id, CAST(json_extract(props, '$.k') AS BIGINT) AS item,
      |    count(*) AS c
      |  FROM events GROUP BY 1, 2
      |), kept AS (
      |  SELECT user_id, item FROM (
      |    SELECT user_id, item, row_number() OVER (
      |      PARTITION BY user_id ORDER BY c DESC, item) AS r
      |    FROM ui
      |  ) WHERE r <= 40
      |)
      |SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_users
      |FROM kept a JOIN kept b
      |  ON a.user_id = b.user_id AND a.item < b.item
      |GROUP BY 1, 2
      |ORDER BY item_a, item_b""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.types._
    val propsSchema = StructType(Seq(StructField("k", LongType)))
    val ui = Tables.events(s, dir)
      .select(col("user_id"),
        from_json(col("props"), propsSchema).getField("k").as("item"))
    graft.ops.Cooccur.itemPairs(ui, "user_id", "item", maxItemsPerUser = 40)
      .orderBy("item_a", "item_b")
  }

  /** Overlapping-interval merge per user: each event spans [ts, ts +
    * value minutes]; the sweep (running-max front + group sum) compacts
    * overlapping-or-touching spans into coverage intervals. The oracle
    * replays the identical two-window sweep.
    */
  val q175IntervalMerge: Q = Q(
    "q175_interval_merge",
    """WITH iv0 AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS lo,
      |    epoch_us(CAST(ts AS TIMESTAMP))
      |      + CAST(round(value * 100) AS BIGINT) * 600000 AS hi
      |  FROM events
      |-- degenerate-row contract, explicit on both sides: Intervals.merge
      |-- drops hi<lo rows, so the oracle must too (otherwise parity would
      |-- silently depend on events.value staying non-negative)
      |), iv AS (
      |  SELECT * FROM iv0 WHERE hi >= lo
      |), sw AS (
      |  SELECT user_id, lo, hi,
      |    max(hi) OVER (PARTITION BY user_id ORDER BY lo, hi
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS front
      |  FROM iv
      |), g AS (
      |  SELECT user_id, lo, hi,
      |    CAST(SUM(CASE WHEN front IS NULL OR lo > front THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY lo, hi
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS grp
      |  FROM sw
      |)
      |SELECT user_id, min(lo) AS merged_lo, max(hi) AS merged_hi,
      |  count(*) AS n_merged
      |FROM g GROUP BY user_id, grp
      |ORDER BY user_id, merged_lo""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    graft.ops.Intervals.merge(
        ev.select(col("user_id"), unix_micros(col("ts")).as("lo"),
          (unix_micros(col("ts")) +
            graft.functions.Exact.cents(col("value")) * 600000L).as("hi")),
        "user_id", col("lo"), col("hi"))
      .orderBy("user_id", "merged_lo")
  }

  /** Trailing 7-day active users (the WAU curve) — exact, via the bounded
    * (user, day) explode, never a sliding countDistinct over raw events.
    */
  val q176RollingActive: Q = Q(
    "q176_rolling_active",
    """WITH ud AS (
      |  SELECT DISTINCT user_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
      |  FROM events
      |), ex AS (
      |  SELECT DISTINCT user_id, day + o.o AS day2
      |  FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS o) o
      |)
      |SELECT day2 AS day, count(*) AS n_active
      |FROM ex GROUP BY 1
      |ORDER BY day""".stripMargin) { (s, dir) =>
    Behavior.rollingActiveDaily(Tables.events(s, dir), "user_id", "ts", 7)
      .orderBy("day")
  }

  /** Debounce per (user, type): keep an event only if it lands more than
    * 24 h after the last KEPT event of its key — sequential kept-state, a
    * fold no window frame can express; the oracle replays it with an
    * ordered list_reduce.
    */
  val q177Debounce: Q = Q(
    "q177_debounce",
    """WITH e AS (
      |  SELECT user_id, event_type, event_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      |  FROM events
      |), g AS (
      |  SELECT user_id, event_type, count(*) AS n_events,
      |    list(ts_us ORDER BY ts_us, event_id) AS l
      |  FROM e GROUP BY 1, 2
      |)
      |SELECT user_id, event_type, n_events,
      |  CAST(len(k) AS BIGINT) AS n_kept,
      |  k[1] AS first_kept, k[len(k)] AS last_kept
      |FROM (
      |  SELECT user_id, event_type, n_events,
      |    list_reduce(list_transform(l, x -> [x]),
      |      (a, b) -> a || CASE WHEN b[1] - a[len(a)] > 86400000000
      |        THEN [b[1]] ELSE [] END) AS k
      |  FROM g
      |)
      |ORDER BY user_id, event_type""".stripMargin) { (s, dir) =>
    graft.ops.Signal.debounce(Tables.events(s, dir),
        Seq("user_id", "event_type"), unix_micros(col("ts")), col("event_id"),
        tolUs = 86400000000L)
      .orderBy("user_id", "event_type")
  }

  /** Per-user EWMA (α = 0.2) of the event value in (ts, id) order — the
    * drift monitor; both engines fold the identical pinned IEEE sequence
    * acc + α(x − acc), so the final doubles are bit-equal.
    */
  val q178Ewma: Q = Q(
    "q178_ewma",
    """WITH e AS (
      |  SELECT user_id, event_id, value,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      |  FROM events
      |), g AS (
      |  SELECT user_id, count(*) AS n,
      |    list(value ORDER BY ts_us, event_id) AS l
      |  FROM e GROUP BY 1
      |)
      |SELECT user_id, n, list_reduce(l, (a, b) -> a + 0.2 * (b - a)) AS ewma
      |FROM g
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    graft.ops.Signal.ewma(Tables.events(s, dir), Seq("user_id"),
        unix_micros(col("ts")), col("event_id"), col("value"),
        alphaPermille = 200)
      .orderBy("user_id")
  }

  /** Longest consecutive-day streak per user — gaps-and-islands via
    * day − row_number(day); all arithmetic in integer days so engine
    * parity is exact. sum() is cast to BIGINT in the oracle because
    * DuckDB widens BIGINT sums to HUGEINT (→ float64 through pandas).
    */
  val q181ActivityStreak: Q = Q(
    "q181_activity_streak",
    """WITH ud AS (
      |  SELECT DISTINCT user_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
      |  FROM events
      |), isl AS (
      |  SELECT user_id, day,
      |    day - row_number() OVER (PARTITION BY user_id ORDER BY day)
      |      AS grp
      |  FROM ud
      |), st AS (
      |  SELECT user_id, count(*) AS len
      |  FROM isl GROUP BY user_id, grp
      |)
      |SELECT user_id, max(len) AS longest_streak,
      |  CAST(sum(len) AS BIGINT) AS n_active_days
      |FROM st GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    Behavior.activityStreaks(Tables.events(s, dir), "user_id", "ts")
      .orderBy("user_id")
  }

  /** SCD2 dimension build: each user's event stream collapsed into
    * validity intervals of consecutive same-type runs (valid_from/
    * valid_to, NULL while current) — the "state AT example time" lookup
    * table that prevents future-state leakage into training examples.
    * Oracle replays the boundary-flag + cumulative-run-id + lead() fold.
    */
  val q188Scd2: Q = Q(
    "q188_scd2_runs",
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      |  FROM events
      |), f AS (
      |  SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
      |                   OR lag(event_type) OVER w != event_type
      |            THEN 1 ELSE 0 END AS chg
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
      |), r AS (
      |  SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id
      |    ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |    AS run_id
      |  FROM f
      |), runs AS (
      |  SELECT user_id, run_id, any_value(event_type) AS event_type,
      |    min(ts_us) AS valid_from_us, CAST(count(*) AS BIGINT) AS n_events
      |  FROM r GROUP BY 1, 2
      |)
      |SELECT user_id, run_id, event_type, valid_from_us,
      |  lead(valid_from_us) OVER w2 AS valid_to_us, n_events,
      |  lead(valid_from_us) OVER w2 IS NULL AS is_current
      |FROM runs WINDOW w2 AS (PARTITION BY user_id ORDER BY run_id)
      |ORDER BY user_id, run_id""".stripMargin) { (s, dir) =>
    Behavior.scd2Runs(Tables.events(s, dir), "user_id", "ts", "event_type",
        "event_id")
      .orderBy("user_id", "run_id")
  }

  /** Running distinct users per active day — the scalable rewrite of the
    * un-windowable COUNT(DISTINCT) OVER (ORDER BY day): per-user min-day,
    * per-day first-seen counts, cumulative integer sum over the tiny day
    * table. Oracle replays the identical decomposition.
    */
  val q190RunningDistinct: Q = Q(
    "q190_running_distinct",
    """WITH e AS (
      |  SELECT user_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
      |  FROM events
      |), days AS (SELECT DISTINCT day FROM e),
      |firstd AS (SELECT user_id, min(day) AS day FROM e GROUP BY 1),
      |newd AS (SELECT day, CAST(count(*) AS BIGINT) AS n FROM firstd GROUP BY 1)
      |SELECT d.day AS day, CAST(coalesce(n.n, 0) AS BIGINT) AS n_new,
      |  CAST(SUM(coalesce(n.n, 0)) OVER (ORDER BY d.day
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
      |FROM days d LEFT JOIN newd n ON n.day = d.day
      |ORDER BY d.day""".stripMargin) { (s, dir) =>
    Behavior.runningDistinctUsers(Tables.events(s, dir), "user_id", "ts")
      .orderBy("day")
  }

  /** Grouped simple OLS: per event type, regress value on hour-of-day.
    * The sufficient statistics (n, Σx, Σx², Σy, Σxy, Σy²) are EXACT
    * integer sums — y scaled to 1e-6 units, Σy² promoted to DECIMAL(38,0)
    * before summing — so the aggregation is order-independent and the
    * closed form runs in DOUBLE on identical integer inputs with an
    * identical op order on both engines (graft.ops.Regression scaladoc
    * has the determinism argument). 1e-6-rounded outputs.
    */
  val q213GroupedOls: Q = {
    def r6(e: String) = graft.functions.Exact.roundPortableSql(e, 6)
    Q(
      "q213_grouped_ols",
      s"""WITH s AS (
         |  SELECT event_type, count(*) AS n,
         |    sum(x) AS sx, sum(x*x) AS sxx,
         |    sum(ys) AS sy, sum(x*ys) AS sxy,
         |    sum(CAST(ys*ys AS DECIMAL(38,0))) AS syy,
         |    min(x) <> max(x) AS x_varies,
         |    min(ys) <> max(ys) AS y_varies
         |  FROM (
         |    SELECT event_type,
         |      CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS x,
         |      CAST(round(value * 1000000) AS BIGINT) AS ys
         |    FROM events)
         |  GROUP BY event_type
         |), d AS (
         |  SELECT event_type, n,
         |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
         |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS denx,
         |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
         |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS deny,
         |    x_varies, y_varies,
         |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
         |  FROM s)
         |SELECT event_type, n,
         |  ${r6("CASE WHEN x_varies THEN (cov / denx) / 1000000.0 END")} AS slope,
         |  ${r6("CASE WHEN x_varies THEN (syd / CAST(n AS DOUBLE) - (cov / denx) * (sxd / CAST(n AS DOUBLE))) / 1000000.0 END")} AS intercept,
         |  ${r6("CASE WHEN x_varies AND y_varies THEN cov * cov / (denx * deny) END")} AS r2
         |FROM d ORDER BY event_type""".stripMargin) { (s, dir) =>
      graft.ops.Regression.groupedOls(Tables.events(s, dir), "event_type",
          hour(col("ts")), col("value"))
        .orderBy("event_type")
    }
  }

  /** Peak concurrent sessions (interval sweep-line): sessionize (30-min
    * gap, half-open [start, last+30min) intervals), then the classic
    * +1/−1 boundary sweep — distributed via per-timestamp delta
    * aggregation + two-pass PrefixSum, NEVER a global single-reducer
    * window (ops/Sweep scaladoc). Output: the peak, the earliest µs
    * attaining it, and the session count. The oracle replays the sweep
    * with DuckDB's (single-node, so safe there) global window.
    */
  val q216PeakConcurrency: Q = Q(
    "q216_peak_concurrency",
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      |  FROM events
      |), sess AS (
      |  SELECT user_id, sid, min(ts_us) AS start_us,
      |    max(ts_us) + 1800000000 AS end_us
      |  FROM (
      |    SELECT user_id, ts_us,
      |      sum(CASE WHEN prev IS NULL OR ts_us - prev > 1800000000 THEN 1 ELSE 0 END)
      |        OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS sid
      |    FROM (
      |      SELECT user_id, event_id, ts_us,
      |        lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
      |      FROM e))
      |  GROUP BY user_id, sid
      |), d AS (
      |  SELECT t, sum(d) AS d FROM (
      |    SELECT start_us AS t, 1 AS d FROM sess
      |    UNION ALL SELECT end_us AS t, -1 AS d FROM sess)
      |  GROUP BY t HAVING sum(d) <> 0
      |), c AS (
      |  SELECT t, sum(d) OVER (ORDER BY t) AS conc FROM d
      |)
      |SELECT CAST(conc AS BIGINT) AS peak_concurrent, t AS first_peak_ts_us,
      |  (SELECT count(*) FROM sess) AS n_sessions
      |FROM c ORDER BY conc DESC, t LIMIT 1""".stripMargin) { (s, dir) =>
    val sess = graft.ops.Sessionize.sessions(Tables.events(s, dir),
        col("user_id"), col("ts"), col("event_id"), 1800000000L)
      .groupBy("user_id", "session_id")
      .agg(min(col("ts_us")).as("start_us"),
        (max(col("ts_us")) + 1800000000L).as("end_us"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.ops.Pins.sealOutput(
      graft.ops.Sweep.peakConcurrency(sess, "start_us", "end_us")
        .select(col("peak_concurrent"),
          col("first_peak_t").as("first_peak_ts_us"))
        .crossJoin(sess.agg(count(lit(1)).as("n_sessions"))),
      sess)
  }

  /** CUSUM changepoint detection over the daily event-count series, in
    * exact integer arithmetic: deviations scaled by the day count D (no
    * mean division), the recursive clamp max(0, S+dev) rewritten as
    * cum − min(0, running-min(cum)) — two windows over the DAY-sized
    * table (TimeSeries.cusum scaladoc). Alarm = S exceeding 5% of total
    * mass, integer-compared at the same scale.
    */
  val q217Cusum: Q = Q(
    "q217_cusum_daily",
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, count(*) AS n FROM events GROUP BY 1
      |), tot AS (SELECT count(*) AS d, sum(n) AS total FROM daily),
      |c AS (
      |  SELECT day, n, d, total,
      |    sum(n * d - total) OVER (ORDER BY day) AS cum
      |  FROM daily, tot
      |), s AS (
      |  SELECT day, n, d, total,
      |    cum - least(CAST(0 AS BIGINT), min(cum) OVER (ORDER BY day)) AS cs
      |  FROM c)
      |SELECT day, n, CAST(cs AS BIGINT) AS cusum_scaled,
      |  CAST(CASE WHEN cs * 20 > total * d * 1 THEN 1 ELSE 0 END AS BIGINT) AS is_alarm
      |FROM s ORDER BY day""".stripMargin) { (s, dir) =>
    graft.ops.TimeSeries.cusum(
        Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n")),
        "day", "n", alarmNum = 1, alarmDen = 20)
      .orderBy("day")
  }

  /** Mann-Whitney U between the click and view value distributions —
    * the distribution-drift test a pipeline runs between sources or
    * before/after a change. Exact doubled-scale integer rank sums
    * (2·avgrank of a tied block is always an integer), tie-corrected z
    * as one fixed IEEE formula over those integers; the rank offsets run
    * through the distributed PrefixSum, never a global window
    * (ops/RankTest scaladoc).
    */
  val q218MannWhitney: Q = Q(
    "q218_mann_whitney",
    s"""WITH v AS (
       |  SELECT value AS v,
       |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
       |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c2
       |  FROM events WHERE event_type IN ('click', 'view') GROUP BY value
       |), r AS (
       |  SELECT c1, c2, c1 + c2 AS t,
       |    coalesce(sum(c1 + c2) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
       |  FROM v
       |), s AS (
       |  SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
       |    CAST(sum(c1 * (prior * 2 + t + 1)) AS BIGINT) AS r1_x2,
       |    sum(CAST(t AS HUGEINT) * t * t - t) AS ties,
       |    count(*) AS nvals
       |  FROM r
       |), s2 AS (
       |  SELECT n1, n2, r1_x2, nvals,
       |    CASE WHEN n1 + n2 > 1 THEN
       |      CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 *
       |      ((CAST(n1 + n2 AS DOUBLE) + 1.0) - CAST(ties AS DOUBLE) /
       |       (CAST(n1 + n2 AS DOUBLE) * (CAST(n1 + n2 AS DOUBLE) - 1.0)))
       |    END AS var_u
       |  FROM s)
       |SELECT n1, n2, CAST(r1_x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
       |  CASE WHEN nvals > 1 AND var_u > 0 THEN ${graft.functions.Exact.roundPortableSql(
            "(CAST(r1_x2 - n1 * (n1 + 1) AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) / " +
            "(2.0 * sqrt(var_u))", 6)} END AS z
       |FROM s2""".stripMargin) { (s, dir) =>
    graft.ops.RankTest.mannWhitney(
      Tables.events(s, dir)
        .where(col("event_type").isin("click", "view")),
      col("value"), col("event_type") === "click")
  }

  val all: Seq[Q] = Seq(q168Funnel, q169CohortRetention, q170Transitions,
    q173Cooccurrence, q175IntervalMerge, q176RollingActive, q177Debounce,
    q178Ewma, q181ActivityStreak, q188Scd2, q190RunningDistinct,
    q213GroupedOls, q216PeakConcurrency, q217Cusum, q218MannWhitney)
}
