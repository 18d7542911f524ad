#!/bin/bash
# sf1 anchor protocol, automated (round 19 — SURVEY §9 #9):
# one JVM per key (solo-ordered — the r15 contamination lesson), two runs
# each, minima folded into BENCH_sf1.json. Usage:
#
#   tools/sf1_anchors.sh key1 key2 ...
#
# Env: SF1_DIR (default /root/repo/testdata-sf1), RUNS (default 2),
#      CPUS (default 8).
set -euo pipefail
cd "$(dirname "$0")/.."
SF1_DIR=${SF1_DIR:-/root/repo/testdata-sf1}
RUNS=${RUNS:-2}
CPUS=${CPUS:-8}
[ $# -ge 1 ] || { echo "usage: $0 key1 [key2 ...]" >&2; exit 2; }
tmp=$(mktemp -d)
for key in "$@"; do
  for i in $(seq 1 "$RUNS"); do
    out="$tmp/${key}_$i.json"
    SPARK_GRAFT_SF_DIR="$SF1_DIR" SPARK_GRAFT_CPUS="$CPUS" \
      SPARK_GRAFT_ONLY="$key" SPARK_GRAFT_MINIMA= \
      SPARK_GRAFT_BENCH_OUT="$out" \
      sbt -batch "runMain graft.Bench" > "$tmp/${key}_$i.log" 2>&1 \
      || { echo "FAIL $key run $i — see $tmp/${key}_$i.log" >&2; exit 1; }
    python3 - "$out" "$key" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
v = d["queries"].get(sys.argv[2])
assert v is not None and v >= 0, f"key {sys.argv[2]} missing from run"
print(f"  {sys.argv[2]}: {v:.3f} s")
EOF
  done
done
python3 - "$tmp" "$RUNS" "$@" <<'EOF'
import json, sys, glob
tmp, runs, keys = sys.argv[1], int(sys.argv[2]), sys.argv[3:]
p = "BENCH_sf1.json"
d = json.load(open(p))
for k in keys:
    vals = []
    for i in range(1, runs + 1):
        vals.append(json.load(open(f"{tmp}/{k}_{i}.json"))["queries"][k])
    best = min(vals)
    d["queries"][k] = best
    d["minima"][k] = min(best, d["minima"].get(k, best))
    print(f"folded {k}: min {best:.3f} s over {vals}")
d["value"] = round(sum(d["queries"].values()), 6)
json.dump(d, open(p, "w"))
print(f"BENCH_sf1.json total now {d['value']:.1f} s / {len(d['queries'])} anchors")
EOF
