package graft

import graft.tools.InvarianceSweep

/** The execution-strategy invariance contract, pinned (round-15): a gate's
  * OUTPUT must not depend on how Spark executed its plan — input file
  * layout, shuffle partition count, codegen vs interpreted expression
  * evaluation, AQE, join-strategy choice. The full 218-gate × 4-mode
  * board is tool-only (`tools/InvarianceSweep`, ~16 min; recorded in
  * PLANS.md: one diff found, q143's unpinned DPP conf dependency, fixed);
  * this spec keeps the contract alive on a family-spanning subset plus
  * the two plan-certification gates whose conf self-pinning the sweep
  * specifically probed.
  */
class InvarianceSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  /** Family-spanning, cheap-at-sf0.001 subset: exact money aggregation
    * (q01 — float partial-agg order), windowed keep-first (q04 — ranking
    * tie totality), seeded-hash split (q07), exact dedup (q25), native
    * scaled-integer cosine kernel (q29 — eval vs doGenCode), ordered
    * collect (q60 — journey determinism), capped posting lists (q65 —
    * the rank-before-collect exchange), mergeable HLL (q127 — the ONE
    * documented partition-nondeterministic estimate, which must stay out
    * of the gate output).
    */
  private val subset = Seq(
    "q01_pricing_summary", "q04_dedup_keep_first", "q07_hash_split",
    "q25_exact_dedup", "q29_cosine_topk", "q60_user_journeys",
    "q65_inverted_index", "q127_hll_merge")

  private def gate(name: String) = SparkEntry.queries(name)

  private val baselineCache =
    scala.collection.mutable.Map.empty[String, (String, Long, String)]
  private def baseline(n: String): (String, Long, String) =
    baselineCache.getOrElseUpdate(n, {
      try InvarianceSweep.fingerprint(gate(n)(spark, sf))
      finally graft.ops.Pins.releaseAll(spark)
    })

  private def assertInvariant(mode: String, names: Seq[String]): Unit = {
    val sess = spark.newSession()
    InvarianceSweep.modeConfs(mode).foreach { case (k, v) =>
      sess.conf.set(k, v) }
    val dir =
      if (mode == "layout") {
        val d = tmpDir("graft_inv_spec_layout")
        InvarianceSweep.writeRepartitionedTables(sess, sf, d, parts = 5)
        d
      } else sf
    names.foreach { n =>
      val got = try InvarianceSweep.fingerprint(gate(n)(sess, dir))
      finally graft.ops.Pins.releaseAll(sess)
      assert(got === baseline(n), s"$n output shifted under mode $mode")
    }
  }

  test("representative gates are bit-identical under hostile layout " +
      "(repartitioned inputs + 7 shuffle partitions)") {
    assertInvariant("layout", subset)
  }

  test("representative gates are bit-identical fully interpreted " +
      "(whole-stage codegen off, NO_CODEGEN factory)") {
    assertInvariant("nocodegen", subset)
  }

  test("plan-certification gates pin their own conf dependencies") {
    // q143's DPP tripwire needs a broadcast-able dim (reuseBroadcastOnly
    // default) — the invariance sweep's one board diff until it pinned
    // its thresholds; q144's skew tripwire needs AQE — pinned since
    // round 8. Both must certify under the HOSTILE ambient session, not
    // refuse.
    assertInvariant("nobroadcast", Seq("q143_dpp_prune"))
    assertInvariant("noaqe", Seq("q144_skew_split"))
  }
}
