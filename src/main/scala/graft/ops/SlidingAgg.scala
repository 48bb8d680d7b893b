package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time sliding aggregates (trailing-lookback RANGE frames) in a
  * shape that scales in BOTH directions the naive plan does not:
  *
  *  1. `SUM(v) OVER (PARTITION BY key ORDER BY ts RANGE L PRECEDING)`
  *     serializes each key's whole timeline through one task — with 5
  *     event types and 100 TB of telemetry that is a 5-way-parallel
  *     stage. Fix: slice each key's timeline into fixed `sliceUs`-wide
  *     windows (≥ lookback), route rows to their slice, and REPLICATE a
  *     slice's trailing `lookbackUs` into the next slice (≤ L/slice
  *     overhead), so every trailing frame is local to (key, slice) and
  *     parallelism is keys × slices.
  *
  *  2. Spark evaluates a moving-lower-bound frame with
  *     `SlidingWindowFunctionFrame`, which REBUILDS the aggregate from
  *     its row buffer every time the lower bound advances (no retract
  *     path) — O(rows × frame_rows) per partition. Dense frames make
  *     that quadratic: a 10×-scale probe (10 M rows, ~60 k rows/frame)
  *     burned 32 cores for tens of minutes. Fix: never emit a sliding
  *     frame at all. Trailing sum over [t−L, t] = cum(≤ t) − cum(≤
  *     t−L−1), two UNBOUNDED-PRECEDING running aggregates — Spark's
  *     growing-frame evaluator updates those in O(1) per row.
  *
  * The cum(≤ t−L−1) lookups are realized as *query points*: one extra
  * row per DISTINCT (key, slice, ts) at position t−L−1, interleaved with
  * the data by the composite order `2·ts + tag` (data tag 0, queries tag
  * 1), so one running window over the union prices every boundary. Data
  * ties share a frame (RANGE semantics on the doubled position), and the
  * query result joins back on (key, slice, ts) — an equi-join already
  * co-partitioned with the window output, so no further shuffle of the
  * data is required.
  */
object SlidingAgg {

  /** Trailing moving count + sum of `valueCol` per `keyCol` over the
    * inclusive event-time window [ts−lookbackUs, ts]. `tsUs` must be an
    * epoch-microseconds BIGINT column (non-negative). Output: input
    * columns + `n_win` + `sum_win`.
    */
  def trailing(df: DataFrame, keyCol: String, tsUs: Column, valueCol: Column,
      lookbackUs: Long, sliceUs: Long): DataFrame = {
    // sliceUs = 0 (legal before when lookbackUs = 0) would reach the
    // DIV/pmod slice routing as a divide-by-zero (round-13 division audit)
    require(sliceUs > 0 && sliceUs >= lookbackUs,
      s"sliceUs ($sliceUs) must be > 0 and >= lookbackUs ($lookbackUs): " +
        "a frame may only reach one slice back")
    val base = df.withColumn("_ts_us", tsUs)
      .withColumn("_slice", expr(s"_ts_us DIV $sliceUs"))
      .withColumn("_v", valueCol)
    val originals = base.withColumn("_replica", lit(false))
    val replicas = base
      .where(pmod(col("_ts_us"), lit(sliceUs)) >= lit(sliceUs - lookbackUs))
      .withColumn("_slice", col("_slice") + 1)
      .withColumn("_replica", lit(true))
    val data = originals.unionByName(replicas)
      .select(col(keyCol), col("_slice"), col("_ts_us"), col("_v"))
      .withColumn("_pos", col("_ts_us") * 2)
      .withColumn("_q", lit(false))
    // one query point per distinct (key, slice, ts), at cum(≤ ts−L−1):
    // position 2(ts−L)−1 sorts strictly after every data point ≤ ts−L−1
    // and strictly before any data point ≥ ts−L
    val queries = originals
      .select(col(keyCol), col("_slice"), col("_ts_us")).distinct()
      .withColumn("_v", lit(0L))
      .withColumn("_pos", (col("_ts_us") - lookbackUs) * 2 - 1)
      .withColumn("_q", lit(true))
    val w = Window.partitionBy(col(keyCol), col("_slice"))
      .orderBy(col("_pos"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = data.unionByName(queries)
      .withColumn("_cum_n", count(when(!col("_q"), 1)).over(w))
      .withColumn("_cum_v", coalesce(sum(when(!col("_q"), col("_v"))).over(w),
        lit(0L)))
    val atData = cum.where(!col("_q"))
      .groupBy(col(keyCol), col("_slice"), col("_ts_us"))
      .agg(max(col("_cum_n")).as("_n_le"), max(col("_cum_v")).as("_v_le"))
    val atQuery = cum.where(col("_q"))
      .select(col(keyCol), col("_slice"), col("_ts_us"),
        col("_cum_n").as("_n_lt"), col("_cum_v").as("_v_lt"))
    val windows = atData.join(atQuery, Seq(keyCol, "_slice", "_ts_us"))
      .select(col(keyCol), col("_slice"), col("_ts_us"),
        (col("_n_le") - col("_n_lt")).as("n_win"),
        (col("_v_le") - col("_v_lt")).as("sum_win"))
    originals.join(windows, Seq(keyCol, "_slice", "_ts_us"))
      .drop("_slice", "_replica", "_v", "_ts_us")
  }
}
