package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Small-file compaction planning — the maintenance op that keeps a
  * 100 TB table readable. Millions of small files destroy scan
  * performance (task-per-file scheduling, row-group overhead); the fix is
  * periodic re-binning of files into target-size outputs. `plan` assigns
  * every file to an output bin with a streaming first-fit walk in a
  * caller-chosen order: `bin = exclusivePrefixBytes DIV targetBytes`.
  *
  * Contract: file order is preserved (so time- or z-ordered layouts stay
  * contiguous within bins), every bin's start is aligned to the target
  * boundary, and a bin overflows by at most the one file that straddles
  * its boundary — the classic streaming-packing guarantee.
  *
  * Scale shape: at 100 TB the MANIFEST itself is large, so the running
  * total rides the distributed two-pass [[PrefixSum]] (range partition +
  * O(partitions) driver state), never a single-reducer global window; the
  * plan is a pure function of (order key, sizes) — identical on any
  * topology, so a re-run after a failure plans the same bins.
  */
object Compaction {

  /** Append `cum_before` (exclusive running bytes in `orderCol` order)
    * and `bin` (the target-size output group) to a file manifest.
    */
  def plan(files: DataFrame, orderCol: String, bytesCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    PrefixSum.exclusive(
        files.withColumn("_b", col(bytesCol).cast("long")), orderCol, "_b", "cum_before")
      .withColumn("bin", expr(s"cum_before DIV $targetBytes"))
      .drop("_b")
  }
}
