package graft

import org.apache.spark.sql.DataFrame
import graft.ops.Cluster

/** Connected-components clustering: known topologies, isolated nodes,
  * convergence on chains, and algorithm parity (propagation vs
  * alternating-star must agree on every graph).
  */
class ClusterSpec extends SparkSuite {
  import spark.implicits._

  private def pairsDf(pairs: Seq[(Long, Long)]): DataFrame =
    pairs.toDF("id_a", "id_b")

  private def labelMap(labels: DataFrame): Map[Long, Long] =
    labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two components and transitive chaining") {
    // {1,2,3} via 1-2, 2-3 (no 1-3 edge: chaining) ; {7,9} ; edge dup + reversed
    val pairs = pairsDf(Seq((1L, 2L), (2L, 3L), (9L, 7L), (2L, 1L)))
    val got = labelMap(Cluster.labelPropagation(pairs, "id_a", "id_b"))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("clusters() covers isolated nodes and flags canonical members") {
    val nodes = (1L to 6L).toDF("doc_id")
    val pairs = pairsDf(Seq((5L, 2L), (2L, 4L)))
    val out = Cluster.clusters(nodes, "doc_id", pairs, "id_a", "id_b")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      (1L, 1L, 1L, true),
      (2L, 2L, 3L, true),
      (3L, 3L, 1L, true),
      (4L, 2L, 3L, false),
      (5L, 2L, 3L, false),
      (6L, 6L, 1L, true)))
  }

  test("alternating-star converges on a long chain in O(log n) rounds") {
    val n = 64
    val chain = pairsDf((0 until n - 1).map(i => (i.toLong, (i + 1).toLong)))
    // maxIter 10 ≈ log2(64) + slack: propagation would need ~63 rounds.
    // driverClosureCeiling = 0 forces the DISTRIBUTED star loop — the
    // default would close this tiny graph on the driver and the
    // convergence contract would go untested.
    val got = labelMap(Cluster.alternatingStar(chain, "id_a", "id_b",
      maxIter = 10, driverClosureCeiling = 0L))
    assert(got.size == n && got.values.forall(_ == 0L))
  }

  test("driver union-find regime matches the distributed star loop") {
    val rnd = new scala.util.Random(7)
    for (m <- Seq(20, 120, 400)) {
      val pairs = pairsDf(
        Seq.fill(m)((rnd.nextInt(70).toLong, rnd.nextInt(70).toLong))
          .filter { case (a, b) => a != b })
      val driver = labelMap(Cluster.alternatingStar(pairs, "id_a", "id_b"))
      val dist = labelMap(Cluster.alternatingStar(pairs, "id_a", "id_b",
        driverClosureCeiling = 0L))
      assert(driver == dist, s"regimes diverged at m=$m")
    }
  }

  test("propagation and alternating-star agree on a random graph") {
    val rnd = new scala.util.Random(42)
    val pairs = pairsDf(Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b })
    val p = labelMap(Cluster.labelPropagation(pairs, "id_a", "id_b"))
    val s = labelMap(Cluster.alternatingStar(pairs, "id_a", "id_b"))
    assert(p == s)
  }

  test("clusters() still elects a canonical when the component min is absent from nodes") {
    // component {2,4,5} has min 2, but nodes only carries 4 and 5:
    // the min PRESENT member (4) must be canonical, or a keep-one
    // consumer would drop the whole group
    val nodes = Seq(4L, 5L, 6L).toDF("doc_id")
    val pairs = pairsDf(Seq((2L, 4L), (2L, 5L)))
    val out = Cluster.clusters(nodes, "doc_id", pairs, "id_a", "id_b")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      (4L, 2L, 2L, true),
      (5L, 2L, 2L, false),
      (6L, 6L, 1L, true)))
  }

  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("both algorithms match a brute-force union-find across densities") {
    val rnd = new scala.util.Random(1234)
    // sparse chains, mid-density, near-clique — plus self-loops and dups
    for (m <- Seq(15, 80, 300)) {
      val pairs = Seq.fill(m)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      val df = pairsDf(pairs)
      val expected = unionFind(pairs.filter { case (a, b) => a != b })
      assert(labelMap(Cluster.labelPropagation(df, "id_a", "id_b")) == expected,
        s"propagation diverged at m=$m")
      assert(labelMap(Cluster.alternatingStar(df, "id_a", "id_b")) == expected,
        s"star diverged at m=$m")
    }
  }

  test("empty pair set leaves every node its own cluster") {
    val nodes = (1L to 3L).toDF("doc_id")
    val out = Cluster.clusters(nodes, "doc_id",
      pairsDf(Seq.empty), "id_a", "id_b")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq == Seq((1L, 1L, 1L, true), (2L, 2L, 1L, true), (3L, 3L, 1L, true)))
  }
}
