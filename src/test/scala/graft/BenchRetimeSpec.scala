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

  // ---- byte-budgeted metric line (round-8 verdict #3: the 176-gate map
  // outgrew the driver's 2000-byte tail and the round parsed null) ----

  private def shortKey(n: String) = n.takeWhile(_ != '_')
  private val jackson = new com.fasterxml.jackson.databind.ObjectMapper()

  // 300 simulated gates — far past the scale that clipped round 8
  private val bigRun: Seq[(String, Double, Double)] =
    (1 to 300).map { i =>
      val sec = if (i == 7) -1.0 else (i % 37) * 0.7 + 0.05
      (f"q$i%03d_gate_name_$i", sec, 0.03)
    }

  // two retimed gates with their audit detail (name, orig, retry, calib, why)
  private val retimeDetail = Seq(
    ("q004_gate_name_4", 40.7, 4.9, 0.310, "calib+slowest"),
    ("q005_gate_name_5", 43.6, 50.0, 0.250, "slowest"))

  test("metricJson stays under the tail budget at 300 gates and parses") {
    val line = Bench.metricJson(bigRun, shortKey, "/sf", 400.0, 0.03, 0.03,
      retimeDetail)
    assert(line.length <= 1900, s"line is ${line.length} bytes")
    val node = jackson.readTree(line)
    assert(node.get("queries_n").asInt === 300)
    val qs = node.get("queries")
    // the failed gate is never dropped; the slowest gates are present
    assert(qs.get("q007").asDouble === -1.0)
    val slowest = bigRun.filter(_._2 >= 0).maxBy(_._2)
    assert(qs.has(shortKey(slowest._1)))
    // totals reconstruct: value = sum(shown) + omitted_sec (to cs rounding)
    var shownSum = 0.0
    qs.propertyStream().forEach { e =>
      if (e.getValue.asDouble >= 0) shownSum += e.getValue.asDouble }
    val rebuilt = shownSum + node.get("omitted_sec").asDouble
    assert(math.abs(rebuilt - node.get("value").asDouble) < 0.01 * 300,
      s"rebuilt $rebuilt vs value ${node.get("value").asDouble}")
    assert(node.get("queries_omitted").asInt ===
      300 - qs.size)
  }

  test("the emitted line NEVER exceeds the budget it was given (real omitted fields)") {
    // round-10 advice: the old greedy scan measured candidates with
    // placeholder omitted fields (0 / 0.000) and the emitted line's real,
    // longer values could overshoot by a few bytes. The scan now measures
    // with the actual omitted count/seconds, so `<= budget` is exact.
    // Sweep budgets across the range where the omitted-field width changes
    // (1-digit to 3-digit counts, 2- to 4-digit seconds).
    for (budget <- Seq(600, 800, 1000, 1300, 1700)) {
      val line = Bench.metricJson(bigRun, shortKey, "/sf", 400.0, 0.03, 0.03,
        retimeDetail, byteBudget = budget)
      assert(line.length <= budget,
        s"budget $budget: emitted ${line.length} bytes")
      assert(jackson.readTree(line).get("queries_n").asInt === 300)
    }
  }

  test("a small board still reports every gate inline") {
    val line = Bench.metricJson(run, shortKey, "/sf", 100.0, 0.03, 0.03, Nil)
    val node = jackson.readTree(line)
    assert(node.get("queries").size === run.size)
    assert(node.get("queries_omitted").asInt === 0)
  }

  test("fullJson carries every gate with its calib probe") {
    val node = jackson.readTree(
      Bench.fullJson(bigRun, "/sf", 400.0, 0.03, 0.03, retimeDetail))
    assert(node.get("queries").size === 300)
    assert(node.get("queries").get(0).get("name").asText ===
      "q001_gate_name_1")
    assert(node.get("queries").get(0).get("calib_sec").asDouble === 0.03)
  }

  test("the artifact records its thread count; legacy boards parse as 32") {
    // round-15: steady baselines are only comparable at the SAME local[n]
    // — an 8-cpu board must never become a 32-cpu run's reference (every
    // gate reads uniformly slower and the median ratio lies). fullJson
    // stamps cpus; parseCpus reads it back, defaulting legacy (pre-field)
    // boards to the harness's 32.
    val stamped = Bench.fullJson(run, "/sf", 100.0, 0.03, 0.03, Nil,
      cpus = "8")
    assert(jackson.readTree(stamped).get("cpus").asText === "8")
    assert(Bench.parseCpus(stamped) === "8")
    val default = Bench.fullJson(run, "/sf", 100.0, 0.03, 0.03, Nil)
    assert(Bench.parseCpus(default) === "32")
    val legacy = """{"metric":"total","value":9.0,"unit":"sec","sf":"/sf"}"""
    assert(Bench.parseCpus(legacy) === "32")
    // round-15 advice: a literal "cpus":"…" in free text BEFORE the real
    // field (hand-edited note, retime_reason prose) must not shadow it —
    // the parse anchors on the adjacent "sf" field fullJson emits
    // (hand-edited files need not even be valid JSON — the parse is regex)
    val shadowed = """{"metric":"total","note":"copied from a """ +
      """"cpus":"8" run","value":9.0,"sf":"/sf","cpus":"16"}"""
    assert(Bench.parseCpus(shadowed) === "16")
    // python-style ": " re-serialization still parses
    val spaced = """{"metric": "total", "sf": "/sf", "cpus": "8"}"""
    assert(Bench.parseCpus(spaced) === "8")
    // round-16 advice: a key-reordering re-serializer (sort_keys) moves
    // "cpus" away from "sf" — the anchored match fails, but an 8-cpu board
    // must NOT silently parse as "32" and slip past readBoard's
    // comparability guard. Fallback: LAST unanchored match (+ a stderr
    // warning), which free text before the real field cannot shadow.
    val reordered = """{"cpus": "8", "metric": "total", "sf": "/sf"}"""
    assert(Bench.parseCpus(reordered) === "8")
    val reorderedShadow = """{"note":"copied from a "cpus":"16" run",""" +
      """"cpus":"8","metric":"total","sf":"/sf"}"""
    assert(Bench.parseCpus(reorderedShadow) === "8")
  }

  // ---- retime audit trail (round-10 verdict #7: retimed_n with no
  // which/why forced the driver to guess) ----

  test("the metric line names each retimed gate with orig/retry/reason") {
    val line = Bench.metricJson(bigRun, shortKey, "/sf", 400.0, 0.03, 0.03,
      retimeDetail)
    val node = jackson.readTree(line)
    assert(node.get("retimed_n").asInt === 2)
    assert(node.get("retime_reason").asText.contains("contended window"))
    val r = node.get("retimed")
    assert(r.size === 2)
    assert(r.get(0).get("q").asText === "q004")
    assert(r.get(0).get("orig").asDouble === 40.7)
    assert(r.get(0).get("retry").asDouble === 4.9)
    assert(r.get(0).get("trailing_calib").asDouble === 0.31)
    assert(r.get(0).get("why").asText === "calib+slowest")
  }

  test("topSlowest picks the K slowest successful gates, skipping failures") {
    val top = Bench.topSlowest(run, k = 3)
    assert(top === Seq("q05_e", "q04_d", "q06_f")) // q08 failed (-1): excluded
    assert(Bench.topSlowest(run, k = 100).size === run.count(_._2 >= 0))
  }

  test("retimeCandidates composes calib/slowest/slow3s with a slowest-first cap") {
    val cands = Bench.retimeCandidates(run, idle, k = 2, slowSec = 3.0,
      cap = 40).toMap
    // q04/q05: contended AND top-2 AND over 3 s
    assert(cands("q04_d") === "calib+slowest+slow3s")
    assert(cands("q05_e") === "calib+slowest+slow3s")
    // q06: contended + over 3 s but not top-2
    assert(cands("q06_f") === "calib+slow3s")
    // failures are never candidates (q08 has the worst calib of the run)
    assert(!cands.contains("q08_h"))
    // sub-3 s clean gates are untouched
    assert(!cands.contains("q01_a") && !cands.contains("q09_i"))
    // the cap keeps a fully-degraded run bounded, slowest first
    val capped = Bench.retimeCandidates(run, idle, cap = 2)
    assert(capped.map(_._1) === Seq("q05_e", "q04_d"))
  }

  test("no retimes → empty audit fields, and the cap keeps the line bounded") {
    val clean = jackson.readTree(
      Bench.metricJson(run, shortKey, "/sf", 100.0, 0.03, 0.03, Nil))
    assert(clean.get("retimed_n").asInt === 0)
    assert(clean.get("retimed").size === 0)
    // pathological: 50 retimed gates must not blow the stdout budget
    val many = (1 to 50).map(i => (f"q$i%03d_g", 10.0, 1.0, 0.3, "calib"))
    val line = Bench.metricJson(bigRun, shortKey, "/sf", 400.0, 0.03, 0.03,
      many)
    assert(line.length <= 1700, s"line is ${line.length} bytes")
    val node = jackson.readTree(line)
    assert(node.get("retimed").size === 8) // capped
    assert(node.get("retimed_truncated").asInt === 42)
    // fullJson is uncapped — the complete trail is always recoverable
    val full = jackson.readTree(
      Bench.fullJson(bigRun, "/sf", 400.0, 0.03, 0.03, many))
    assert(full.get("retimed").size === 50)
  }
}
