#!/bin/bash
# Same-window A/B bench (round-15 verdict #4, mechanizing commit b52c8a2's
# hand procedure): build a named git ref in a throwaway worktree, bench it
# and the CURRENT tree back-to-back in ONE host window, and emit one
# artifact carrying both boards. This is the standing resolution for every
# ambiguous bench verdict: cross-round comparisons mix host windows, but an
# A/B inside one window cancels the host term — if HEAD's per-gate median
# vs the ref is < 1, the new code is faster no matter how contended the
# window was (that is how the round-15 "2.9x regression" was resolved as a
# host artifact: unchanged r14 tree 346.9 s vs r15 tree 308.4 s, minutes
# apart).
#
# Round-17 additions (round-16 verdict #1–#3):
#  - ab_steady_estimate_sec: when the A side is the tree that produced the
#    committed steady board, a_ref.total / steady_ref measures the window's
#    inflation on code that cannot have regressed against itself, so
#    b_head.total / that factor is the window-cancelled steady estimate for
#    HEAD (the figure round-16's attempt-8 resolution derived by prose:
#    327.08 x 246.88 / 344.12 = 234.7 s). Emitted in the artifact AND as
#    bench_steady_ab.json (provenance "ab-anchored" — a derived fallback,
#    clearly labeled; it never replaces bench_steady*.json and the Bench
#    classifier never reads it).
#  - shell-sampled host telemetry per leg: the r14 Bench binary predates
#    /proc telemetry, so a_ref.steal_pct is null from the board; the script
#    now samples /proc/stat + /proc/loadavg around EACH leg itself
#    (shell_steal_pct / shell_load1_*), so both legs always carry steal.
#  - ABDIR is created up front and cleaned by the same EXIT trap (round-16
#    advice: a set -e failure used to leak it in /tmp).
#
# Usage: tools/bench_ab.sh <ref> [sfDir] [out.json]
#   ref     git ref for the A side (e.g. the last round-close commit)
#   sfDir   testdata dir (default /root/testdata/sf0.1)
#   out     artifact path (default bench_ab.json); a compact line is also
#           appended to bench_ab_history.jsonl
#
# Order: REF first, then HEAD — matching b52c8a2. Each side's full board
# (bench_last.json, with its own contention classification and host
# telemetry) is preserved next to the artifact as bench_ab_<side>.json.
set -euo pipefail
cd "$(dirname "$0")/.."
REF="${1:?usage: bench_ab.sh <ref> [sfDir] [out.json]}"
SF="${2:-/root/testdata/sf0.1}"
OUT="${3:-bench_ab.json}"
REFSHA=$(git rev-parse --short "$REF")
WT=$(mktemp -d /tmp/graft_ab.XXXXXX)
ABDIR=$(mktemp -d /tmp/graft_ab_run.XXXXXX)
cleanup() {
  git worktree remove --force "$WT" 2>/dev/null || rm -rf "$WT"
  git worktree prune 2>/dev/null || true
  rm -rf "$ABDIR"
}
trap cleanup EXIT

# One /proc snapshot: "<total_jiffies> <steal_jiffies> <load1>"
host_snap() {
  python3 -c "
v = [int(x) for x in open('/proc/stat').readline().split()[1:]]
load = open('/proc/loadavg').read().split()[0]
print(sum(v), v[7] if len(v) > 7 else 0, load)" 2>/dev/null || echo "0 0 0"
}

echo "[ab] building ref $REFSHA in $WT"
git worktree add --detach "$WT" "$REF" >/dev/null
(cd "$WT" && sbt -batch compile >/dev/null)

echo "[ab] building HEAD (working tree)"
sbt -batch compile >/dev/null

# each side classifies itself against the committed steady reference
cp bench_steady*.json "$ABDIR/" 2>/dev/null || true
echo "[ab] benching ref $REFSHA on $SF"
host_snap > "$ABDIR/a_host0.txt"
(cd "$ABDIR" && GRAFT_CLASSES="$WT/target/scala-2.13/classes" \
  SPARK_GRAFT_SF_DIR="$SF" bash /root/repo/tools/run_verify.sh graft.Bench \
  >"$ABDIR/a_stdout.txt" 2>"$ABDIR/a_stderr.txt")
host_snap > "$ABDIR/a_host1.txt"
mv "$ABDIR/bench_last.json" "$ABDIR/a_board.json"

echo "[ab] benching HEAD on $SF"
host_snap > "$ABDIR/b_host0.txt"
(cd "$ABDIR" && SPARK_GRAFT_SF_DIR="$SF" \
  bash /root/repo/tools/run_verify.sh graft.Bench \
  >"$ABDIR/b_stdout.txt" 2>"$ABDIR/b_stderr.txt")
host_snap > "$ABDIR/b_host1.txt"
mv "$ABDIR/bench_last.json" "$ABDIR/b_board.json"

cp "$ABDIR/a_board.json" bench_ab_ref.json
cp "$ABDIR/b_board.json" bench_ab_head.json

# Merge: totals, per-side contention verdicts, shell-sampled host windows,
# the window-cancelling per-gate median of HEAD/ref (computed over gates
# both boards timed successfully; sub-500ms ref gates excluded as scheduler
# noise, same floor as the Bench classifier), and the ab-anchored steady
# estimate vs the committed steady board for this sf.
python3 - "$ABDIR" "$REFSHA" "$SF" "$OUT" <<'PY'
import json, sys, os, statistics
abdir, refsha, sf, out = sys.argv[1:5]
a = json.load(open(f"{abdir}/a_board.json"))
b = json.load(open(f"{abdir}/b_board.json"))

def shell_host(side):
    try:
        t0, s0, l0 = open(f"{abdir}/{side}_host0.txt").read().split()
        t1, s1, l1 = open(f"{abdir}/{side}_host1.txt").read().split()
        dt = int(t1) - int(t0)
        steal = round(100.0 * (int(s1) - int(s0)) / dt, 3) if dt > 0 else None
        return steal, float(l0), float(l1)
    except Exception:
        return None, None, None

def board(d, side):
    gates = {q["name"]: q["sec"] for q in d["queries"]}
    c = d.get("contention", {})
    h = d.get("host", {})
    steal, l0, l1 = shell_host(side)
    return gates, {
        "total_sec": d["value"], "wall_sec": d["wall_sec"],
        "verdict": c.get("verdict"), "median_vs_steady": c.get("median_ratio"),
        "steady_estimate_sec": c.get("steady_estimate_sec"),
        "steal_pct": h.get("steal_pct"), "load1_start": h.get("load1_start"),
        "load1_end": h.get("load1_end"),
        # script-sampled window telemetry: present even when the side's
        # binary predates /proc telemetry (round-16 verdict #3)
        "shell_steal_pct": steal, "shell_load1_start": l0,
        "shell_load1_end": l1,
        "failed": sorted(q["name"] for q in d["queries"] if q["sec"] < 0)}
ga, sa = board(a, "a"); gb, sb = board(b, "b")
ratios = sorted(gb[k] / ga[k] for k in ga
                if k in gb and ga[k] >= 0.5 and gb[k] >= 0)
med = statistics.median(ratios) if len(ratios) >= 5 else None

# Committed steady reference for this sf (same lookup order as Bench):
# bench_steady.<sfname>.json, then legacy bench_steady.json — sf-checked.
steady_ref = None
sfname = os.path.basename(sf.rstrip("/"))
for cand in (f"bench_steady.{sfname}.json", "bench_steady.json"):
    try:
        d = json.load(open(cand))
        if d.get("sf") == sf:
            steady_ref = d["value"]
            break
    except Exception:
        pass
ab_est = (round(sb["total_sec"] * steady_ref / sa["total_sec"], 2)
          if steady_ref and sa["total_sec"] > 0 else None)

rec = {"ref": refsha, "sf": sf, "cpus": a.get("cpus", "32"),
       "a_ref": sa, "b_head": sb,
       "head_over_ref_total": round(sb["total_sec"] / sa["total_sec"], 4),
       "head_over_ref_median": round(med, 4) if med is not None else None,
       "overlap_n": len(ratios),
       # window-cancelled steady estimate for HEAD (round-16 verdict #2):
       # valid when <ref> is the tree that produced the steady board
       "steady_ref_sec": steady_ref,
       "ab_steady_estimate_sec": ab_est,
       "ab_provenance": "ab-anchored" if ab_est is not None else None}
json.dump(rec, open(out, "w"), indent=1)
with open("bench_ab_history.jsonl", "a") as f:
    f.write(json.dumps({"ref": refsha, "sf": sf,
        "a_total": sa["total_sec"], "b_total": sb["total_sec"],
        "median": rec["head_over_ref_median"],
        "a_verdict": sa["verdict"], "b_verdict": sb["verdict"],
        "a_steal": sa["steal_pct"], "b_steal": sb["steal_pct"],
        "a_shell_steal": sa["shell_steal_pct"],
        "b_shell_steal": sb["shell_steal_pct"],
        "ab_steady_estimate": ab_est}) + "\n")
# The formal fallback figure (round-16 verdict #1): a clearly-labeled
# DERIVED steady estimate. Separate file on purpose — bench_steady*.json
# stays measured-only and the Bench classifier never reads this.
if ab_est is not None:
    json.dump({"provenance": "ab-anchored", "ref": refsha, "sf": sf,
               "cpus": rec["cpus"], "steady_ref_sec": steady_ref,
               "a_ref_total_sec": sa["total_sec"],
               "b_head_total_sec": sb["total_sec"],
               "ab_steady_estimate_sec": ab_est,
               "head_over_ref_median": rec["head_over_ref_median"]},
              open("bench_steady_ab.json", "w"), indent=1)
verdict = "FASTER" if med is not None and med < 1.0 else \
          ("SLOWER" if med is not None else "inconclusive")
print(f"[ab] ref {refsha}: {sa['total_sec']:.1f} s  HEAD: "
      f"{sb['total_sec']:.1f} s  per-gate median HEAD/ref: {med}  "
      f"=> HEAD is {verdict} (window-cancelled)")
if ab_est is not None:
    print(f"[ab] ab-anchored steady estimate for HEAD: {ab_est:.1f} s "
          f"(= {sb['total_sec']:.2f} x {steady_ref:.2f} / "
          f"{sa['total_sec']:.2f}; window inflation on the ref leg "
          f"{sa['total_sec']/steady_ref:.3f}x) -> bench_steady_ab.json")
PY
echo "[ab] wrote $OUT (+ bench_ab_ref.json / bench_ab_head.json / bench_ab_history.jsonl)"
