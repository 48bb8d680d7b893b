package graft

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench contention classifier (round-13 verdict #1) on the THREE
  * recorded driver boards whose diagnosis previously required hand
  * forensics:
  *
  *  - r11: 294.5 s — the IO/memory-bandwidth contention class (top gates
  *    inflated ~uniformly while most trailing calibs stayed flat; one
  *    probe spiked). Judged contended after a 30-gate ratio study.
  *  - r12: 267.7 s — steady (within the 255–280 s band, calib max 2.7×
  *    floor, 31 retimes < cap, flat ratios vs the idle closing board).
  *  - r13: 309.2 s — contended (calib spike 0.190 = 7× floor, retime cap
  *    hit at 40, median 1.14–1.21× uniform inflation on code-unchanged
  *    gates; the builder's idle closing bench two commits earlier was
  *    263.2 s).
  *
  * The reference board is the committed bench_steady.json (the 263.2 s
  * idle closing board of round 13). These are REAL artifacts, read from
  * the repo — if the classifier's thresholds drift, this spec fails on
  * recorded history, not on synthetic fixtures.
  */
class BenchContentionSpec extends AnyFunSuite {

  private def repoFile(name: String): File = {
    val local = new File(name)
    if (local.isFile) local else new File("/root/repo", name)
  }

  private def read(name: String): String =
    new String(Files.readAllBytes(repoFile(name).toPath), "UTF-8")

  private def num(json: String, field: String): Double =
    ("\"" + field + "\":\\s*(-?[0-9.]+)").r.findFirstMatchIn(json)
      .getOrElse(fail(s"field $field not found")).group(1).toDouble

  private lazy val steadyRef: (Double, Map[String, Double]) = {
    val (total, sf, gates) = Bench.parseFullBoard(read("bench_steady.json"))
      .getOrElse(fail("bench_steady.json unparseable"))
    assert(sf == "/root/testdata/sf0.1")
    assert(gates.size > 200, s"steady board has only ${gates.size} gates")
    (total, gates)
  }

  private def classify(benchFile: String): (String, Option[Double], Double, Int) = {
    val json = read(benchFile)
    Bench.contentionVerdict(
      total = num(json, "value"),
      gates = Bench.parseTruncatedQueries(json),
      calibFloor = num(json, "calib_min_sec"),
      calibMax = num(json, "calib_max_sec"),
      retimedN = num(json, "retimed_n").toInt,
      ref = Some(steadyRef))
  }

  test("r11 driver board (294.5 s): contended — calib spike AND uniform inflation") {
    val (verdict, median, steadyEst, overlap) = classify("BENCH_r11.json")
    assert(verdict == "contended", s"median=$median")
    assert(overlap > 30, s"overlap=$overlap")
    assert(median.exists(_ >= 1.1), s"median=$median")
    // deflated estimate lands near the steady band, not at the raw 294
    assert(steadyEst > 230 && steadyEst < 275, s"steadyEst=$steadyEst")
  }

  test("r12 driver board (267.7 s): steady — all three signals quiet") {
    val (verdict, median, steadyEst, overlap) = classify("BENCH_r12.json")
    assert(verdict == "steady", s"median=$median")
    assert(overlap > 30, s"overlap=$overlap")
    assert(median.exists(_ < 1.1), s"median=$median")
    // a steady run's estimate IS its raw total
    assert(math.abs(steadyEst - 267.657) < 0.01)
  }

  test("r13 driver board (309.2 s): contended — calib 7x, cap hit, median >= 1.1") {
    val json = read("BENCH_r13.json")
    assert(num(json, "calib_max_sec") / num(json, "calib_min_sec") > 3.0)
    assert(num(json, "retimed_n").toInt >= 40) // cap hit
    val (verdict, median, steadyEst, _) = classify("BENCH_r13.json")
    assert(verdict == "contended")
    assert(median.exists(_ >= 1.1), s"median=$median")
    // raw 309 deflates into the 243-270 steady band
    assert(steadyEst > 240 && steadyEst < 275, s"steadyEst=$steadyEst")
  }

  test("no reference: classification degrades to calib+cap, never crashes") {
    // clean calibs, no cap: steady
    val (v1, m1, e1, n1) = Bench.contentionVerdict(100.0,
      Map("q1" -> 50.0, "q2" -> 50.0), 0.03, 0.035, 10, None)
    assert(v1 == "steady" && m1.isEmpty && e1 == 100.0 && n1 == 0)
    // calib spike alone trips; estimate stays raw (no median to deflate by)
    val (v2, _, e2, _) = Bench.contentionVerdict(100.0,
      Map("q1" -> 50.0), 0.03, 0.2, 10, None)
    assert(v2 == "contended" && e2 == 100.0)
    // retime-cap hit alone trips
    val (v3, _, _, _) = Bench.contentionVerdict(100.0,
      Map("q1" -> 50.0), 0.03, 0.035, 40, None)
    assert(v3 == "contended")
  }

  test("median needs >= 5 overlapping gates; sub-500ms reference gates are excluded") {
    val ref = Some((10.0, Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0,
      "d" -> 1.0, "tiny" -> 0.1)))
    // only 4 usable overlaps (tiny excluded) -> no median, calib decides
    val (v, m, _, n) = Bench.contentionVerdict(40.0,
      Map("a" -> 5.0, "b" -> 5.0, "c" -> 5.0, "d" -> 5.0, "tiny" -> 5.0),
      0.03, 0.03, 0, ref)
    assert(m.isEmpty && n == 4 && v == "steady")
    // a 5th usable overlap enables the median signal -> 5x inflation trips
    val ref5 = Some((10.0, Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0,
      "d" -> 1.0, "e" -> 1.0)))
    val (v5, m5, e5, _) = Bench.contentionVerdict(25.0,
      Map("a" -> 5.0, "b" -> 5.0, "c" -> 5.0, "d" -> 5.0, "e" -> 5.0),
      0.03, 0.03, 0, ref5)
    assert(v5 == "contended" && m5.contains(5.0) && math.abs(e5 - 5.0) < 1e-9)
  }

  test("metric line with the contention block still respects the stdout byte budget") {
    // 300-gate scale, worst case: contention block present AND a retime
    // audit — the greedy query-map prefix must absorb the block's bytes
    val merged = (1 to 300).map(i => (f"q$i%03d_gate", 1.5 + i * 0.01, 0.03))
    val short = (n: String) => n.substring(0, n.indexOf('_'))
    val gates = merged.map { case (n, s, _) => short(n) -> s }.toMap
    val cont = Bench.contentionJson(450.0, gates, 0.027, 0.19, 40,
      Some((263.0, gates.map { case (k, v) => k -> v / 1.2 })))
    val detail = merged.take(12).map { case (n, s, c) => (n, s * 3, s, c, "slowest") }
    val line = Bench.metricJson(merged, short, "/root/testdata/sf0.1",
      500.0, 0.03, 0.03, detail, cont)
    assert(line.length <= 1700, s"line is ${line.length} bytes")
    assert(line.contains("\"contention\":{"), line.take(200))
    assert(line.contains("\"verdict\":\"contended\""))
  }

  test("contention JSON fragment carries every field the forensics needed") {
    val j = Bench.contentionJson(309.16,
      Map("a" -> 5.0, "b" -> 5.0, "c" -> 5.0, "d" -> 5.0, "e" -> 5.0),
      0.027, 0.19, 40,
      Some((263.2, Map("a" -> 4.0, "b" -> 4.0, "c" -> 4.0, "d" -> 4.0,
        "e" -> 4.0))))
    for (f <- Seq("calib_ratio", "retime_cap_hit", "median_ratio",
        "ref_total_sec", "overlap_n", "verdict", "steady_estimate_sec"))
      assert(j.contains("\"" + f + "\""), s"missing $f in $j")
    assert(j.contains("\"verdict\":\"contended\""))
    assert(j.contains("\"retime_cap_hit\":true"))
  }
}
