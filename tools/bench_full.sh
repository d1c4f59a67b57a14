#!/usr/bin/env bash
# Best-of-N full-suite bench protocol — the committed-headline recipe.
#
# WHY: the committed bench_out.json is the number cross-round carried-set
# comparisons anchor on (tools/bench_carried.sh reads both trees' committed
# inventories), but single full runs ride the sandbox's background-load
# window: the r19 same-tree full-run spread was 325.8 -> 684.7 s with
# gc_total 5.6 -> 18.1 tracking it — a 2x swing that says NOTHING about the
# tree. The headline must compare trees, not windows, so the protocol runs
# the full suite N times and commits the BEST run (minimum total — the
# closest observable to the tree's zero-contention cost; gc_total printed
# beside every leg so a pressured "best" is visible).
#
# Usage: tools/bench_full.sh [N] [sf_dir] [cpus]
#   N       full runs (default 3)
#   sf_dir  default /root/testdata/sf0.1
#   cpus    default 32
#
# Output: .ab/full_run_{1..N}.json + bench_out.json overwritten with the
# best run. Commit bench_out.json only from this protocol.
set -euo pipefail
cd "$(dirname "$0")/.."

N="${1:-3}"
SF_DIR="${2:-/root/testdata/sf0.1}"
CPUS="${3:-32}"

mkdir -p .ab
for i in $(seq 1 "$N"); do
  out=".ab/full_run_$i.json"
  ( SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="$CPUS" \
      sbt -batch "runMain graft.Bench" 2>&1 \
    | grep -o '{"metric":"total".*}' ) > "$out"
  python3 - "$out" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
print(f"[bench_full] {sys.argv[1]}: total {d['value']:.1f} s over "
      f"{len(d['queries'])} queries, gc {d['gc_total']:.1f} s")
EOF
done

python3 - "$N" <<'EOF'
import json, shutil, sys
n = int(sys.argv[1])
runs = [(json.load(open(f".ab/full_run_{i}.json"))["value"], i)
        for i in range(1, n + 1)]
best_val, best_i = min(runs)
shutil.copy(f".ab/full_run_{best_i}.json", "bench_out.json")
d = json.load(open("bench_out.json"))
print(f"[bench_full] best of {n}: run {best_i} -> bench_out.json "
      f"(total {d['value']:.1f} s, gc {d['gc_total']:.1f} s; "
      f"spread {best_val:.1f} .. {max(v for v, _ in runs):.1f})")
EOF
