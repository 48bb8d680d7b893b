package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contended-window simulation for Bench's self-defending retime pass
  * (round-7 verdict #3): the policy that decides WHICH gates to re-time and
  * HOW both measurements merge is pure, so the mid-run-contention scenario
  * the last two rounds' driver artifacts actually exhibited is testable
  * without a bench run.
  */
class BenchRetimeSpec extends AnyFunSuite {

  // a 10-gate run where the host degrades 10× for a mid-run window
  // (the BENCH_r07 shape: calib 0.03 s idle, 0.31 s at the cliff)
  private val idle = 0.030
  private val run: Seq[(String, Double, Double)] = Seq(
    ("q01_a", 1.0, 0.031), ("q02_b", 2.0, 0.029), ("q03_c", 1.5, 0.033),
    ("q04_d", 40.7, 0.310), ("q05_e", 43.6, 0.250), ("q06_f", 8.0, 0.095),
    ("q07_g", 1.2, 0.030), ("q08_h", -1.0, 0.400), // failed inside the window
    ("q09_i", 0.5, 0.032), ("q10_j", 0.8, 0.029))

  test("contendedGates flags exactly the gates timed in the degraded window") {
    val flagged = Bench.contendedGates(run, idle)
    // 3× baseline = 0.09 s: q04 (0.31), q05 (0.25), q06 (0.095) are in the
    // window; q08's calib is worse still but the gate FAILED — retrying a
    // deterministic failure is noise, not a measurement
    assert(flagged === Seq("q04_d", "q05_e", "q06_f"))
  }

  test("an idle run retimes nothing") {
    val flat = run.map { case (n, s, _) => (n, s.max(0.1), 0.031) }
    assert(Bench.contendedGates(flat, idle).isEmpty)
  }

  test("mergeRetimed takes min-of-runs and never raises a reading") {
    val retimed = Map("q04_d" -> 4.9, "q05_e" -> 50.0, "q06_f" -> -1.0)
    val merged = Bench.mergeRetimed(run, retimed).map(r => r._1 -> r._2).toMap
    assert(merged("q04_d") === 4.9)   // contention confirmed: retry wins
    assert(merged("q05_e") === 43.6)  // retry slower (still contended): keep orig
    assert(merged("q06_f") === 8.0)   // retry failed: keep orig
    assert(merged("q01_a") === 1.0)   // untouched gates unchanged
    assert(merged("q08_h") === -1.0)  // failures stay failures
  }

  test("a fully-contended run keeps a finite baseline and still retries") {
    // baseline is min over calibStart + all trailing calibs — when the
    // WHOLE run is degraded the baseline is the degraded probe cost and
    // nothing clears 3×, so the pass is a no-op rather than an
    // infinite-retry loop
    val allBad = run.map { case (n, s, _) => (n, s.max(0.1), 0.30) }
    val baseline = (0.30 +: allBad.map(_._3)).min
    assert(Bench.contendedGates(allBad, baseline).isEmpty)
  }
}
