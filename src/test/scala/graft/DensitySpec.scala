package graft

import org.apache.spark.sql.functions._
import graft.ops.Density

/** DBSCAN (ops/Density) vs a sequential brute-force reference. */
class DensitySpec extends SparkSuite {
  import spark.implicits._

  /** Sequential DBSCAN with the same deterministic contract: cosine ≥ t
    * neighborhoods, core = |N ∪ self| ≥ minPts, clusters = min-id closure
    * over core-core edges, border = min cluster among core neighbors.
    */
  private def reference(vecs: Map[Long, Array[Double]], t: Double, minPts: Int)
      : Map[Long, (Boolean, Option[Long], String)] = {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val sa = a.map(x => math.round(x * 1e6))
      val sb = b.map(x => math.round(x * 1e6))
      val dot = sa.zip(sb).map { case (x, y) => x * y }.sum.toDouble
      dot / (math.sqrt(sa.map(x => x * x).sum.toDouble) *
        math.sqrt(sb.map(x => x * x).sum.toDouble))
    }
    val ids = vecs.keys.toSeq.sorted
    val nbrs = ids.map { i =>
      i -> ids.filter(j => j != i && cos(vecs(i), vecs(j)) >= t).toSet
    }.toMap
    val core = ids.filter(i => nbrs(i).size + 1 >= minPts).toSet
    // closure over core-core edges: iterate min-label to fixpoint
    var label = core.map(i => i -> i).toMap
    var changed = true
    while (changed) {
      changed = false
      for (i <- core; j <- nbrs(i) if core(j)) {
        val m = math.min(label(i), label(j))
        if (label(i) != m || label(j) != m) {
          label += i -> m; label += j -> m; changed = true
        }
      }
    }
    ids.map { i =>
      if (core(i)) i -> ((true, Some(label(i)), "core"))
      else {
        val coreNbrs = nbrs(i).filter(core)
        if (coreNbrs.nonEmpty)
          i -> ((false, Some(coreNbrs.map(label).min), "border"))
        else i -> ((false, None, "noise"))
      }
    }.toMap
  }

  // Two dense blobs, one bridge-border point, isolated noise. 2-dim vectors
  // padded to 4 dims so the scaled-int cosine has some spread.
  private lazy val pts: Seq[(Long, Array[Double])] = Seq(
    0L -> Array(1.0, 0.02, 0.0, 0.0),
    1L -> Array(1.0, 0.05, 0.01, 0.0),
    2L -> Array(0.98, 0.0, 0.02, 0.01),
    3L -> Array(0.0, 1.0, 0.03, 0.0),   // blob 2
    4L -> Array(0.02, 1.0, 0.0, 0.01),
    5L -> Array(0.0, 0.97, 0.05, 0.0),
    6L -> Array(0.6, 0.75, 0.0, 0.0),   // between blobs — border or noise
    7L -> Array(0.0, 0.0, 1.0, 0.0),    // isolated
    8L -> Array(0.0, 0.01, 0.0, 1.0)    // isolated
  )

  private def run(t: Double, minPts: Int, subBlocks: Int = 1)
      : Map[Long, (Boolean, Option[Long], String)] = {
    val df = pts.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    Density.dbscan(df, "vec_id", "embedding", lit(1), t, minPts, subBlocks)
      .collect().map { r =>
        r.getLong(0) -> ((r.getBoolean(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getString(3)))
      }.toMap
  }

  test("dbscan matches the sequential reference (two blobs + noise)") {
    val expected = reference(pts.toMap, 0.9, 3)
    assert(run(0.9, 3) === expected)
    // sanity on the expected structure itself: both blobs present, some noise
    val roles = expected.values.map(_._3).toSeq
    assert(roles.count(_ == "core") >= 4)
    assert(roles.contains("noise"))
    assert(expected.values.flatMap(_._2).toSet.size >= 2) // ≥2 clusters
  }

  test("dbscan parity across thresholds and minPts") {
    for ((t, mp) <- Seq((0.8, 2), (0.95, 3), (0.9, 5)))
      assert(run(t, mp) === reference(pts.toMap, t, mp), s"t=$t minPts=$mp")
  }

  test("minPts=1 makes every point a core singleton-or-cluster") {
    val out = run(0.99, 1)
    assert(out.values.forall(_._1 === true))
    assert(out.values.forall(_._3 === "core"))
    assert(out.values.forall(_._2.isDefined))
  }

  test("impossible threshold yields all-noise") {
    val out = run(1.1, 2)
    assert(out.values.forall(v => !v._1 && v._2.isEmpty && v._3 === "noise"))
  }

  test("hot-block sub-chunking (subBlocks>1) leaves the result invariant") {
    assert(run(0.9, 3, subBlocks = 3) === run(0.9, 3))
  }
}
