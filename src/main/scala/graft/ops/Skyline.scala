package graft.ops

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** 2D skyline (Pareto front) selection — multi-objective "best" rows where
  * no other row is ≥ in both dimensions and > in at least one (Börzsönyi et
  * al., ICDE'01). The curation use: pick documents no other document beats
  * on BOTH quality and length (or any two scoring axes) instead of
  * thresholding each axis independently.
  *
  * Scale shape: the naive NOT EXISTS is O(n²). In 2D the front is
  * computable with one per-x aggregation plus ONE ordered pass — a point
  * survives iff its y equals its x-group's max AND beats the running max of
  * all strictly-greater x groups. The ordered pass uses the two-pass
  * partition-offset pattern ([[PrefixSum]]): range-partition the (distinct-x
  * sized) group table descending, collect one max per partition
  * (O(partitions) driver traffic), rescan with exclusive offsets. No
  * partition-less window, no cross join, and the final filter is a
  * broadcast-friendly equi-join back onto the input on x.
  */
object Skyline {

  /** Exclusive descending running max: for each row of `df` (one row per
    * distinct `xCol`), `outCol` = max of `vCol` over all rows with
    * strictly greater `xCol` (null when none). `vCol` must be DoubleType.
    */
  private def exclusiveRunningMaxDesc(df: DataFrame, xCol: String,
      vCol: String, outCol: String): (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    val n = spark.sparkContext.defaultParallelism
    val sorted = df.repartitionByRange(n, col(xCol).desc)
      .sortWithinPartitions(col(xCol).desc)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val vIdx = sorted.schema.fieldIndex(vCol)
    val partials = sorted.toDF().rdd.mapPartitions { rows =>
      var m = Double.NegativeInfinity
      var any = false
      rows.foreach { r => any = true; m = math.max(m, r.getDouble(vIdx)) }
      Iterator((TaskContext.getPartitionId(), if (any) Some(m) else None))
    }.collect().toMap
    val offsets: IndexedSeq[Option[Double]] =
      (0 until n).scanLeft(Option.empty[Double]) { (acc, p) =>
        val cur = partials.get(p).flatten
        (acc, cur) match {
          case (Some(a), Some(c)) => Some(math.max(a, c))
          case (a, c) => a.orElse(c)
        }
      }
    val outSchema = StructType(sorted.schema.fields :+
      StructField(outCol, DoubleType, nullable = true))
    (sorted.mapPartitions { rows =>
      var running = offsets(TaskContext.getPartitionId())
      rows.map { r =>
        val out = Row.fromSeq(r.toSeq :+ running.map(Double.box).orNull)
        running = Some(running.fold(r.getDouble(vIdx))(math.max(_, r.getDouble(vIdx))))
        out
      }
    }(Encoders.row(outSchema)), sorted) // caller releases the pin (Pins)
  }

  /** The Pareto front of `df` maximizing (xCol, yCol). Rows with a NULL in
    * either dimension are excluded (they cannot be compared). Duplicate
    * points on the front all survive (neither dominates the other).
    */
  def front2(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val pts = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
    val g = pts.groupBy(col(xCol))
      .agg(max(col(yCol).cast("double")).as("_gy"))
    val (r, pin) = exclusiveRunningMaxDesc(g, xCol, "_gy", "_em")
    Pins.sealOutput(
      pts.join(r, Seq(xCol))
        .where(col(yCol).cast("double") === col("_gy") &&
          (col("_em").isNull || col("_em") < col(yCol).cast("double")))
        .drop("_gy", "_em"),
      pin)
  }

  /** In-memory reference for tests: direct dominance test, O(n²). */
  def front2Ref(pts: Seq[(Long, Double, Double)]): Set[Long] =
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, x2, y2) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y)
      }
    }.map(_._1).toSet
}
