package graft.ops

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed global prefix sum — the primitive behind sequence packing,
  * global offsets, and file-layout planning that Spark's own window API
  * cannot express at scale: `Window.orderBy(...)` with no partition key
  * moves EVERY row to one reducer. The classic two-pass form stays fully
  * parallel:
  *
  *   1. range-partition + sort by the (unique) order key — one shuffle,
  *      the same cost any global ordering pays;
  *   2. per-partition partial sums (one tiny row per partition to the
  *      driver — O(partitions), not O(rows));
  *   3. per-partition rescan adding the exclusive offset of all earlier
  *      partitions.
  *
  * The result is independent of the partition boundaries (range-sampling
  * randomness only moves WHERE the cuts fall), so runs are deterministic
  * as long as the order key is unique — with ties, the intra-tie order
  * (and therefore each tied row's prefix) is partition-dependent; callers
  * must pass a total order.
  */
object PrefixSum {

  /** Append `outCol` = EXCLUSIVE prefix sum of `valueCol` (long) in
    * `orderCol` order: sum of all strictly-earlier rows' values.
    */
  def exclusive(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    val sorted = df.repartitionByRange(n, col(orderCol))
      .sortWithinPartitions(orderCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val valueIdx = sorted.schema.fieldIndex(valueCol)
    // pass 1: one (partition, sum) row per partition
    val partials = sorted.toDF().rdd
      .mapPartitions { rows =>
        var s = 0L
        rows.foreach(r => s += r.getLong(valueIdx))
        Iterator((TaskContext.getPartitionId(), s))
      }
      .collect()
      .toMap
    // exclusive per-partition offsets on the driver: O(partitions)
    val offsets = (0 until n).scanLeft(0L)((acc, p) => acc + partials.getOrElse(p, 0L))
    val outSchema = StructType(sorted.schema.fields :+
      StructField(outCol, LongType, nullable = false))
    Pins.sealOutput(
      sorted.mapPartitions { rows =>
        var running = offsets(TaskContext.getPartitionId())
        rows.map { r =>
          val out = Row.fromSeq(r.toSeq :+ running)
          running += r.getLong(valueIdx)
          out
        }
      }(Encoders.row(outSchema)),
      sorted)
  }

  /** Append `outCol` = 1-based global row number in `orderCols` order
    * (which must be a total order — ties would make the numbering
    * partition-dependent). Same two-pass shape as [[exclusive]] with a
    * constant weight of 1, generalized to a composite sort key: one range
    * shuffle, an O(partitions) driver collect of per-partition counts, and
    * a map-only rescan. This is the scalable `row_number() OVER (ORDER BY
    * …)` — the built-in window form funnels every row through one reducer.
    */
  def rowNumber(df: DataFrame, orderCols: Seq[String], outCol: String,
      partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    val key = orderCols.map(col)
    val sorted = df.repartitionByRange(n, key: _*)
      .sortWithinPartitions(key: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partials = sorted.toDF().rdd
      .mapPartitions { rows =>
        Iterator((TaskContext.getPartitionId(), rows.size.toLong))
      }
      .collect()
      .toMap
    val offsets = (0 until n).scanLeft(0L)((acc, p) => acc + partials.getOrElse(p, 0L))
    val outSchema = StructType(sorted.schema.fields :+
      StructField(outCol, LongType, nullable = false))
    Pins.sealOutput(
      sorted.mapPartitions { rows =>
        var running = offsets(TaskContext.getPartitionId())
        rows.map { r =>
          running += 1L
          Row.fromSeq(r.toSeq :+ running)
        }
      }(Encoders.row(outSchema)),
      sorted)
  }
}
