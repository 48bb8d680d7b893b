package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Explicit bloom-filter semi-join reduction — the scale path that
  * [[Curation.decontaminate]]'s scaladoc promises for key sets too large
  * to broadcast-join outright but far smaller than the probe side.
  *
  * Build ONE bloom sketch over the key side with Catalyst's native
  * `BloomFilterAggregate` (mergeable partial aggregates — the same
  * machinery Spark's `InjectRuntimeFilter` rule uses), pull the single
  * serialized sketch to the driver (one row, `optimalNumOfBits/8` bytes —
  * 1 M keys at 1% fpp ≈ 1.2 MiB), embed it as a binary literal, and
  * prefilter the probe side with `BloomFilterMightContain` — a codegen'd
  * predicate evaluated at the SCAN, before any exchange. The residual
  * exact semi-join then shuffles only the survivors (true matches plus
  * the fpp sliver), restoring exact semantics.
  *
  * Why explicit when AQE/`InjectRuntimeFilter` exists: the automatic
  * rewrite only fires within one query when creation-side stats prove
  * selectivity. The explicit form works when the key set comes from a
  * DIFFERENT job or a materialized table, survives across
  * materialization boundaries, and lets the caller pick fpp for the
  * key-set size they know. At 100 TB the win is that the fact scan's
  * output — not the full fact table — pays the shuffle.
  *
  * Both sides hash through `xxhash64` (64-bit, codegen'd), matching the
  * insert/probe convention of Spark's own runtime filters. NULL keys
  * never equi-join, and bloom false positives never survive the residual
  * join, so the composition is EXACTLY `big SEMI JOIN keys`.
  */
object BloomJoin {

  /** Serialized bloom sketch over `xxhash64(key)` of `keys`. Returns None
    * for an empty key set (the aggregate yields no sketch).
    */
  def buildSketch(keys: DataFrame, key: Column, expectedItems: Long,
      fpp: Double): Option[Array[Byte]] = {
    require(expectedItems > 0, s"expectedItems must be > 0, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      GraftBridge.toExpression(xxhash64(key)),
      Literal(expectedItems), Literal(numBits))
    val row = keys.select(GraftBridge.toColumn(agg.toAggregateExpression())).head()
    if (row.isNullAt(0)) None else Some(row.getAs[Array[Byte]](0))
  }

  /** Codegen'd `might_contain(sketch, xxhash64(key))` predicate — the
    * prefilter half, exposed for tests and for callers that stage the
    * sketch themselves (e.g. persisted from an earlier job).
    */
  def mightContain(sketch: Array[Byte], key: Column): Column =
    GraftBridge.toColumn(BloomFilterMightContain(
      Literal(sketch, BinaryType),
      GraftBridge.toExpression(xxhash64(key))))

  /** `big SEMI JOIN keys ON bigKey = smallKey`, with the big side
    * bloom-prefiltered at the scan before the exchange. `expectedItems`
    * ≤ 0 means probe it (`keys.count()` — one small-side agg job, cheap
    * next to the probe-side scan it saves).
    */
  def semiJoin(big: DataFrame, bigKey: Column, keys: DataFrame, smallKey: Column,
      expectedItems: Long = 0L, fpp: Double = 0.01): DataFrame = {
    val n = if (expectedItems > 0) expectedItems else keys.count()
    buildSketch(keys, smallKey, math.max(n, 1L), fpp) match {
      case None => big.where(lit(false)) // empty key set: empty semi-join
      case Some(sketch) =>
        big.where(mightContain(sketch, bigKey))
          .join(keys.select(smallKey.as("_bj_key")).dropDuplicates("_bj_key"),
            bigKey === col("_bj_key"), "left_semi")
    }
  }

  /** `big ANTI JOIN keys ON bigKey = smallKey` — the tombstone/exclusion
    * shape (J2/J3, q09) at bloom scale. Here the sketch works the OTHER
    * way round: a bloom proves ABSENCE, so every `NOT might_contain` row
    * is kept outright without ever joining; only the `might_contain`
    * sliver (true members + fpp of the rest) pays the exact anti-join
    * that weeds the false positives back in. NULL probe keys match
    * nothing under equi-join semantics and are kept, like Spark's own
    * left_anti (NOT-IN SQL differs on NULLs — mirror oracles with
    * `NOT EXISTS`, not `NOT IN`).
    *
    * Cost shape: the union reads `big` twice, but the definite-absent
    * branch is map-only (no exchange at all) and the join branch
    * shuffles only the sliver — vs a plain left_anti shuffling the
    * ENTIRE big side. A pruned columnar re-scan is cheap next to a
    * full-fact shuffle; when it isn't (big side already in memory),
    * use the plain anti-join.
    */
  def antiJoin(big: DataFrame, bigKey: Column, keys: DataFrame, smallKey: Column,
      expectedItems: Long = 0L, fpp: Double = 0.01): DataFrame = {
    val n = if (expectedItems > 0) expectedItems else keys.count()
    buildSketch(keys, smallKey, math.max(n, 1L), fpp) match {
      case None => big // empty key set: anti-join keeps everything
      case Some(sketch) =>
        val mc = mightContain(sketch, bigKey)
        // NULL key → mc is NULL → `!mc` not true → row routed to the exact
        // anti-join side, which keeps it (null never equi-joins)
        big.where(!mc || mc.isNull)
          .unionByName(
            big.where(mc)
              .join(keys.select(smallKey.as("_bj_key")).dropDuplicates("_bj_key"),
                bigKey === col("_bj_key"), "left_anti"))
    }
  }
}
