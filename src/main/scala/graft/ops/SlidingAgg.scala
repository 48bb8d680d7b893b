package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time sliding aggregates (trailing-lookback RANGE frames) in a
  * shape that scales past "one partition per key".
  *
  * The naive plan — `SUM(v) OVER (PARTITION BY key ORDER BY ts RANGE
  * BETWEEN L PRECEDING AND CURRENT ROW)` — is exact but serializes each
  * key's whole timeline through one task. With 5 event types and 100 TB
  * of telemetry that is a 5-way-parallel stage, i.e. a stall.
  *
  * Scalable decomposition: slice each key's timeline into fixed windows
  * of `sliceUs` (must be ≥ `lookbackUs`), route every event to its slice,
  * and REPLICATE the events from a slice's trailing `lookbackUs` into the
  * next slice. Every original row's trailing frame is then fully local to
  * its (key, slice) group — originals of its own slice plus the replicas
  * carried across the boundary — so the same RANGE window runs per
  * (key, slice) with (keys × slices)-way parallelism, and only originals
  * are emitted. Replication overhead ≤ lookback/slice (25 % at the
  * default 4× slice). Exactness is by construction: for t in slice s,
  * [t−L, t] ⊆ [sliceStart−L, sliceEnd), all of which lands in group
  * (key, s).
  *
  * The trailing frame bound is inclusive on both ends ([t−L, t]),
  * matching SQL `RANGE BETWEEN L PRECEDING AND CURRENT ROW` — all ts
  * peers join the frame, so the result is deterministic without a
  * tiebreak column.
  */
object SlidingAgg {

  /** Trailing moving count + sum of `valueCol` per `keyCol` over the
    * inclusive event-time window [ts−lookbackUs, ts]. `tsUs` must be an
    * epoch-microseconds BIGINT column (non-negative). Output: input
    * columns + `n_win` + `sum_win`.
    */
  def trailing(df: DataFrame, keyCol: String, tsUs: Column, valueCol: Column,
      lookbackUs: Long, sliceUs: Long): DataFrame = {
    require(sliceUs >= lookbackUs,
      s"sliceUs ($sliceUs) must be >= lookbackUs ($lookbackUs): a frame " +
        "may only reach one slice back")
    val base = df.withColumn("_ts_us", tsUs)
      .withColumn("_slice", expr(s"_ts_us DIV $sliceUs"))
      .withColumn("_v", valueCol)
    val originals = base.withColumn("_replica", lit(false))
    val replicas = base
      .where(pmod(col("_ts_us"), lit(sliceUs)) >= lit(sliceUs - lookbackUs))
      .withColumn("_slice", col("_slice") + 1)
      .withColumn("_replica", lit(true))
    val w = Window.partitionBy(col(keyCol), col("_slice"))
      .orderBy(col("_ts_us"))
      .rangeBetween(-lookbackUs, 0)
    originals.unionByName(replicas)
      .withColumn("n_win", count(lit(1)).over(w))
      .withColumn("sum_win", sum(col("_v")).over(w))
      .where(!col("_replica"))
      .drop("_slice", "_replica", "_v", "_ts_us")
  }
}
