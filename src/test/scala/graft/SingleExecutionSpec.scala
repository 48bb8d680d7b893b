package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent}
import org.apache.spark.sql.execution.ui.{
  SparkListenerSQLAdaptiveExecutionUpdate, SparkListenerSQLExecutionStart}

/** The plan-shape tripwired gates must execute their physical plan ONCE.
  *
  * Round 12 shipped the tripwires with a separate `qe.toRdd.count()`
  * "flowed" probe — a second full execution of the gate plan purely to
  * decide whether the plan assertion was vacuous (round-12 verdict,
  * "What's wrong" #2: doubles those gates' cost at any scale and muddies
  * their timings). Round 13 derives `flowed` from the gate's own
  * materialized result instead; this spec pins the fix with the
  * SQL-execution event stream: running each tripwired gate must produce
  * EXACTLY ONE SQL execution whose (final, post-AQE-replan) physical plan
  * contains that gate's tripwire marker. Under the old probe each gate
  * produced two. The post-checkpoint row count the gates now use scans
  * the pinned blocks (`Scan ExistingRDD`), so it can never carry a marker.
  */
class SingleExecutionSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.01"

  // gate → case-insensitive substring of the plan node/expression the
  // gate's tripwire certifies (present only in the real gate execution)
  private val markers = Seq(
    "q132_bucketed_join"   -> "sortmergejoin",
    "q140_bloom_inject"    -> "might_contain",
    "q143_dpp_prune"       -> "dynamicpruning",
    "q144_skew_split"      -> "sortmergejoin",
    "q145_aqe_coalesce"    -> "aqeshuffleread",
    "q146_window_topk"     -> "windowgrouplimit",
    "q149_aqe_broadcast"   -> "broadcasthashjoin",
    "q172_sliding_window"  -> "window",
    "q182_extension_fusion" -> "levenshtein")

  for ((gate, marker) <- markers)
    test(s"$gate executes its plan exactly once ('$marker' in one SQL execution)") {
      // latest plan description per executionId: AQE replans in place, so
      // runtime-injected nodes (AQEShuffleRead, runtime BHJ) only appear
      // in the SparkListenerSQLAdaptiveExecutionUpdate descriptions
      val plans = TrieMap.empty[Long, String]
      val listener = new SparkListener {
        override def onOtherEvent(event: SparkListenerEvent): Unit = event match {
          case e: SparkListenerSQLExecutionStart =>
            plans(e.executionId) = e.physicalPlanDescription
          case e: SparkListenerSQLAdaptiveExecutionUpdate =>
            plans(e.executionId) = e.physicalPlanDescription
          case _ => ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        SparkEntry.queries(gate)(spark, sfDir)
        org.apache.spark.sql.graft.GraftBridge
          .waitListenerBusEmpty(spark.sparkContext, 60000)
      } finally {
        spark.sparkContext.removeSparkListener(listener)
        graft.ops.Pins.releaseAll(spark)
      }
      val hits = plans.filter(_._2.toLowerCase.contains(marker)).keys.toSeq.sorted
      assert(hits.size == 1,
        s"$gate: expected exactly 1 SQL execution containing '$marker', " +
          s"got ${hits.size} (execution ids: ${hits.mkString(",")})")
    }
}
