package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Rolling checkpoint chain for iterative plans (connected components,
  * PageRank): `next(df)` eagerly localCheckpoints `df` and THEN frees the
  * blocks of the chain's previous round (safe — localCheckpoint is eager,
  * so by the time it returns the new round no longer reads the old blocks).
  * localCheckpoint registers RDD-level caches that `Dataset.unpersist` does
  * not reach, hence the id bookkeeping. The chain's final checkpoint is
  * never freed — it backs the returned DataFrame.
  *
  * A multi-hour production run should swap in reliable `checkpoint`
  * (HDFS-backed) so executor loss cannot force a full recompute; the chain
  * structure is unchanged.
  */
private[graft] final class CheckpointChain(spark: SparkSession) {
  private var liveRdd: Option[org.apache.spark.rdd.RDD[_]] = None
  def next(df: DataFrame): DataFrame = {
    val out = df.localCheckpoint() // eager
    // Track EXACTLY the checkpoint RDD backing `out` (via its LogicalRDD
    // plan) — never a getPersistentRDDs diff, which would mis-claim any
    // unrelated cache (a caller's persisted edge list, an op's internal
    // cache) that happens to first materialize during this action.
    val rdd = org.apache.spark.sql.graft.GraftBridge.checkpointRdd(out)
    release()
    liveRdd = rdd
    out
  }
  /** Free the current blocks (only call when the chain's latest result
    * is no longer needed by anything downstream).
    */
  def release(): Unit = {
    liveRdd.foreach(_.unpersist(blocking = false))
    liveRdd = None
  }
}
