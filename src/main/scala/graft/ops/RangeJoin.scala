package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — match left points `x` to right intervals
  * `[lo, hi)` — as a BUCKETIZED EQUI-JOIN, the second time-series join
  * Spark lacks as a built-in (next to [[AsOfJoin]]).
  *
  * A naive `lo <= x AND x < hi` theta join is un-plannable as an
  * equi-join: Spark executes it as a broadcast nested loop (fine only
  * when one side is tiny) or a cartesian product (O(n·m), fatal when
  * both sides are large). The bucket trick restores an equi-join: pick a
  * width `w`, explode each interval into the fixed-width buckets it
  * overlaps, bucket each point as `floor(x / w)`, equi-join on the
  * bucket id, and re-check the exact predicate. A (point, interval) pair
  * can only meet in the point's single bucket, so matches are produced
  * exactly once — no dedup pass.
  *
  * Integer domain (`x`, `lo`, `hi` cast to long; `hi` exclusive).
  * Choose `w` near the typical interval width: replication per interval
  * is `ceil(span / w) + 1` buckets, and bucket population bounds the
  * per-reducer work. Both sides shuffle once on the bucket id.
  */
object RangeJoin {

  /** @param maxBucketsPerInterval replication cap: an interval wider than
    *        `maxBucketsPerInterval × bucketWidth` fails fast with the
    *        offending bounds in the message instead of letting `sequence()`
    *        blow past Spark's array limit (or explode-amplify just below
    *        it). Raise `bucketWidth` — or, deliberately, this cap.
    */
  def bucketed(left: DataFrame, xCol: String, right: DataFrame,
      loCol: String, hiCol: String, bucketWidth: Long,
      maxBucketsPerInterval: Long = 1L << 20): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    require(maxBucketsPerInterval >= 1,
      s"maxBucketsPerInterval must be >= 1, got $maxBucketsPerInterval")
    val w = lit(bucketWidth)
    // [lo, hi) with hi exclusive: the last overlapped bucket is the one
    // containing hi - 1; empty intervals (hi <= lo) overlap none and are
    // dropped by the (ascending) sequence guard
    val firstBkt = floor(col(loCol).cast("long") / w).cast("long")
    val lastBkt = floor((col(hiCol).cast("long") - 1) / w).cast("long")
    val rb = right
      .filter(col(hiCol).cast("long") > col(loCol).cast("long"))
      .withColumn("_bkt", explode(
        when(lastBkt - firstBkt < lit(maxBucketsPerInterval),
          sequence(firstBkt, lastBkt))
        .otherwise(raise_error(format_string(
          "graft.RangeJoin: interval [%s, %s) spans %s buckets at " +
            s"bucketWidth=$bucketWidth (cap $maxBucketsPerInterval); " +
            "use a larger bucketWidth",
          col(loCol).cast("long"), col(hiCol).cast("long"),
          lastBkt - firstBkt + 1)))))
    val lb = left.withColumn("_bkt", floor(col(xCol).cast("long") / w).cast("long"))
    lb.join(rb, Seq("_bkt"))
      .filter(col(xCol).cast("long") >= col(loCol).cast("long") &&
        col(xCol).cast("long") < col(hiCol).cast("long"))
      .drop("_bkt")
  }
}
