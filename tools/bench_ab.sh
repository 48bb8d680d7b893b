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
cleanup() {
  git worktree remove --force "$WT" 2>/dev/null || rm -rf "$WT"
  git worktree prune 2>/dev/null || true
}
trap cleanup EXIT

echo "[ab] building ref $REFSHA in $WT"
git worktree add --detach "$WT" "$REF" >/dev/null
(cd "$WT" && sbt -batch compile >/dev/null)

echo "[ab] building HEAD (working tree)"
sbt -batch compile >/dev/null

ABDIR=$(mktemp -d /tmp/graft_ab_run.XXXXXX)
# each side classifies itself against the committed steady reference
cp bench_steady*.json "$ABDIR/" 2>/dev/null || true
echo "[ab] benching ref $REFSHA on $SF"
(cd "$ABDIR" && GRAFT_CLASSES="$WT/target/scala-2.13/classes" \
  SPARK_GRAFT_SF_DIR="$SF" bash /root/repo/tools/run_verify.sh graft.Bench \
  >"$ABDIR/a_stdout.txt" 2>"$ABDIR/a_stderr.txt")
mv "$ABDIR/bench_last.json" "$ABDIR/a_board.json"

echo "[ab] benching HEAD on $SF"
(cd "$ABDIR" && SPARK_GRAFT_SF_DIR="$SF" \
  bash /root/repo/tools/run_verify.sh graft.Bench \
  >"$ABDIR/b_stdout.txt" 2>"$ABDIR/b_stderr.txt")
mv "$ABDIR/bench_last.json" "$ABDIR/b_board.json"

cp "$ABDIR/a_board.json" bench_ab_ref.json
cp "$ABDIR/b_board.json" bench_ab_head.json

# Merge: totals, per-side contention verdicts, and the window-cancelling
# signal — the per-gate median of HEAD/ref (computed over gates both
# boards timed successfully; sub-500ms ref gates excluded as scheduler
# noise, same floor as the Bench classifier).
python3 - "$ABDIR/a_board.json" "$ABDIR/b_board.json" "$REFSHA" "$SF" "$OUT" <<'PY'
import json, sys, statistics
a_path, b_path, refsha, sf, out = sys.argv[1:6]
a = json.load(open(a_path)); b = json.load(open(b_path))
def board(d):
    gates = {q["name"]: q["sec"] for q in d["queries"]}
    c = d.get("contention", {})
    h = d.get("host", {})
    return gates, {
        "total_sec": d["value"], "wall_sec": d["wall_sec"],
        "verdict": c.get("verdict"), "median_vs_steady": c.get("median_ratio"),
        "steady_estimate_sec": c.get("steady_estimate_sec"),
        "steal_pct": h.get("steal_pct"), "load1_start": h.get("load1_start"),
        "load1_end": h.get("load1_end"), "failed":
            sorted(q["name"] for q in d["queries"] if q["sec"] < 0)}
ga, sa = board(a); gb, sb = board(b)
ratios = sorted(gb[k] / ga[k] for k in ga
                if k in gb and ga[k] >= 0.5 and gb[k] >= 0)
med = statistics.median(ratios) if len(ratios) >= 5 else None
rec = {"ref": refsha, "sf": sf, "cpus": a.get("cpus", "32"),
       "a_ref": sa, "b_head": sb,
       "head_over_ref_total": round(sb["total_sec"] / sa["total_sec"], 4),
       "head_over_ref_median": round(med, 4) if med is not None else None,
       "overlap_n": len(ratios)}
json.dump(rec, open(out, "w"), indent=1)
with open("bench_ab_history.jsonl", "a") as f:
    f.write(json.dumps({"ref": refsha, "sf": sf,
        "a_total": sa["total_sec"], "b_total": sb["total_sec"],
        "median": rec["head_over_ref_median"],
        "a_verdict": sa["verdict"], "b_verdict": sb["verdict"],
        "a_steal": sa["steal_pct"], "b_steal": sb["steal_pct"]}) + "\n")
verdict = "FASTER" if med is not None and med < 1.0 else \
          ("SLOWER" if med is not None else "inconclusive")
print(f"[ab] ref {refsha}: {sa['total_sec']:.1f} s  HEAD: "
      f"{sb['total_sec']:.1f} s  per-gate median HEAD/ref: {med}  "
      f"=> HEAD is {verdict} (window-cancelled)")
PY
rm -rf "$ABDIR"
echo "[ab] wrote $OUT (+ bench_ab_ref.json / bench_ab_head.json / bench_ab_history.jsonl)"
