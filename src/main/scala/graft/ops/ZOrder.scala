package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout for multi-dimensional data skipping — the
  * OPTIMIZE ZORDER pattern: sort the corpus by interleaved key bits so any
  * contiguous chunk of rows covers a compact hyper-rectangle in key space,
  * which shrinks per-file min/max ranges and lets format-level stats prune
  * scans on EITHER predicate column.
  *
  * The z-value is a statically-unrolled bitwise fold — pure codegen'd
  * integer ops (no UDF, no loop at runtime), exactly portable to any
  * engine with shift/and/or.
  *
  * At 100 TB: `layoutByZ` is one range-partitioning shuffle (sampled
  * bounds) + per-partition sort — the same cost as any global sort — and
  * pays for itself on every subsequent selective scan. Keys should be
  * rank/quantile-normalized first when value distributions are heavily
  * skewed (bit entropy concentrates in high bits otherwise).
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative integer columns:
    * x's bit i → z bit 2i, y's bit i → z bit 2i+1. `bits` ≤ 31 keeps the
    * result positive in a Long.
    */
  def zValue2(x: Column, y: Column, bits: Int = 31): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Reference implementation for tests. */
  def zValue2Ref(x: Long, y: Long, bits: Int = 31): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Range-partition + sort the frame by the z-value of (xCol, yCol):
    * the write-side layout operator. `numFiles` partitions ≈ output files;
    * each covers a compact z-range (hence a compact (x, y) rectangle set).
    */
  def layoutByZ(df: DataFrame, xCol: String, yCol: String,
      numFiles: Int, bits: Int = 31): DataFrame = {
    val withZ = df.withColumn("_z", zValue2(col(xCol), col(yCol), bits))
    withZ.repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
  }
}
