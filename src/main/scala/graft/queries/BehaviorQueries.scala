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

  val all: Seq[Q] = Seq(q168Funnel, q169CohortRetention, q170Transitions,
    q173Cooccurrence)
}
