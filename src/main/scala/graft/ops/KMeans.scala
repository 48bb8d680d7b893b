package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact-arithmetic Lloyd k-means over embedding vectors.
  *
  * Every distance is computed on 1e6-scaled Long vectors
  * ([[Similarity.scaled]]), so assignments are bit-identical across
  * engines — no FP-sum order sensitivity — and centroid updates floor the
  * per-dimension mean back onto the same 1e6 grid (floor of an exact
  * integer ratio through one IEEE divide: deterministic, see the gate
  * scaladoc for the boundary argument). Seeds are the k smallest ids —
  * deterministic initialization is the whole point of the harness; a
  * production caller would pass k-means|| seeds instead.
  *
  * Scale shape (the textbook distributed Lloyd): centroids are a k-row
  * table BROADCAST into a map-side distance projection (d² expands to
  * ‖x‖² + ‖c‖² − 2x·c, so the row norm ‖x‖² is computed once per row and
  * the native codegen'd dot ([[graft.functions.Dot]]) is the only
  * per-(row, centroid) work); the argmin is a k-way `min(struct)` inside
  * one map-side-combined aggregation, and the update is one
  * posexplode→groupBy per iteration — per-iteration shuffle volume is
  * O(rows·dim) skinny longs, never pairwise. At 100 TB this is exactly
  * MLlib's KMeans data flow, minus the nondeterministic FP tree-sums that
  * would break a cross-engine replay.
  */
object KMeans {

  /** `iters` Lloyd steps from the k smallest-id seeds; returns the LAST
    * assignment `(id, cluster_id, d2)` — each row's cluster and its
    * squared scaled distance to the centroid it was assigned against
    * (i.e. the centroids produced by iteration `iters − 1`).
    */
  def lloydAssign(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters > 0, s"kmeans: k=$k iters=$iters must be positive")
    val sv = df.select(col(idCol).cast("long").as("_id"),
        Similarity.scaled(col(vecCol)).as("_s"))
      .withColumn("_ss", Similarity.dotScaled(col("_s"), col("_s")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    def withNorm(c: DataFrame): DataFrame =
      c.withColumn("_cc", Similarity.dotScaled(col("_c"), col("_c")))
    var cent = withNorm(sv.filter(col("_id") < k)
      .select(col("_id").as("_cid"), col("_s").as("_c")))
    // assign: argmin over centroids of ‖x−c‖² = ‖x‖² + ‖c‖² − 2x·c, with
    // (d², cid) struct-min for a total order (ties → smallest cid)
    def assign(c: DataFrame): DataFrame =
      sv.crossJoin(broadcast(c))
        .select(col("_id"), col("_s"),
          struct((col("_ss") + col("_cc") -
            lit(2L) * Similarity.dotScaled(col("_s"), col("_c"))).as("_d2"),
            col("_cid")).as("_m"))
        .groupBy("_id")
        .agg(min(col("_m")).as("_m"), first(col("_s")).as("_s"))
        .select(col("_id"), col("_s"),
          col("_m._cid").as("_cid"), col("_m._d2").as("_d2"))
    var assigned: DataFrame = null
    for (_ <- 1 to iters) {
      // pin each round: the next update + assign reuse it, and lineage
      // would otherwise double per iteration
      val a = assign(cent).localCheckpoint()
      assigned = a
      // update: per-(cluster, dim) floored mean back onto the 1e6 grid;
      // clusters that lost every member simply drop out (both engines)
      cent = withNorm(a
        .select(col("_cid"), posexplode(col("_s")).as(Seq("_dim", "_x")))
        .groupBy("_cid", "_dim")
        .agg(floor(sum(col("_x")).cast("double") / count(lit(1))).as("_cx"))
        .groupBy("_cid")
        .agg(transform(
          array_sort(collect_list(struct(col("_dim"), col("_cx")))),
          e => e.getField("_cx")).as("_c")))
    }
    Pins.sealOutput(
      assigned.select(col("_id").as(idCol), col("_cid").as("cluster_id"),
        col("_d2").as("d2")),
      sv)
  }
}
