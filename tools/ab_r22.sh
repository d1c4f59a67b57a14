#!/usr/bin/env bash
# Matched-core interleaved A/B between the working tree (new) and the r21
# baseline worktree (.ab/r21base, old) for a named query subset.
#
# Usage: tools/ab_r22.sh <tag> <query_csv> [reps] [cpus] [sf_dir]
# Output: .ab/ab_<tag>_{new,old}_<i>.json; legs alternate new/old so both
# sample the same host-noise windows.
set -euo pipefail
cd "$(dirname "$0")/.."
TAG="$1"; QUERIES="$2"; REPS="${3:-2}"; CPUS="${4:-32}"; SF="${5:-/root/testdata/sf0.1}"
mkdir -p .ab
for i in $(seq 1 "$REPS"); do
  for leg in new old; do
    dir="."; [ "$leg" = old ] && dir=".ab/r21base"
    out="$PWD/.ab/ab_${TAG}_${leg}_${i}.json"
    ( cd "$dir" && SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" \
        SPARK_GRAFT_ONLY="$QUERIES" SPARK_GRAFT_BENCH_OUT="$out" \
        sbt -batch "runMain graft.Bench" > /dev/null 2>&1 )
    python3 - "$out" "$TAG/$leg/$i" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
print(f"[ab] {sys.argv[2]}: total {d['value']:.2f} s, gc {d['gc_total']:.2f} s")
EOF
  done
done
python3 - "$TAG" "$REPS" <<'EOF'
import json, sys
tag, reps = sys.argv[1], int(sys.argv[2])
def best(leg):
    runs = [json.load(open(f".ab/ab_{tag}_{leg}_{i}.json")) for i in range(1, reps+1)]
    q = {k: min(r["queries"][k] for r in runs) for k in runs[0]["queries"]}
    return q
n, o = best("new"), best("old")
tot_n, tot_o = sum(n.values()), sum(o.values())
print(f"[ab] {tag}: best-per-query totals new {tot_n:.2f} s vs old {tot_o:.2f} s "
      f"({tot_n/tot_o:.3f}x)")
for k in sorted(n, key=lambda k: n[k]-o[k]):
    print(f"  {n[k]-o[k]:+7.2f}  {o[k]:7.2f} -> {n[k]:7.2f}  {k}")
EOF
