#!/bin/bash
# Scaling-efficiency harness: identical pipeline job at N=8 and 4N=32 cores,
# each pinned to its CPU set in a fresh JVM (see ScalingBench scaladoc).
set -euo pipefail
cd "$(dirname "$0")/.."

ROWS="${SPARK_GRAFT_SCALE_ROWS:-2000000}"
export SPARK_GRAFT_SCALE_ROWS="$ROWS"

run() { # cores cpuset
  taskset -c "$2" sbt -batch "runMain graft.ScalingBench $1" 2>&1 |
    grep -o '{"metric":"pipeline_throughput".*}' | tail -1
}

echo "running local[8] pinned to cpus 0-7..." >&2
J8=$(run 8 0-7)
echo "$J8" >&2
echo "running local[32] pinned to cpus 0-31..." >&2
J32=$(run 32 0-31)
echo "$J32" >&2

python3 - "$J8" "$J32" <<'EOF'
import json, sys
a, b = json.loads(sys.argv[1]), json.loads(sys.argv[2])
eff = (b["images_per_sec"] / a["images_per_sec"]) / 4.0
out = {"metric": "scaling_efficiency", "value": round(eff, 3), "unit": "ratio",
       "rows": a["rows"], "images_per_sec_local8": a["images_per_sec"],
       "images_per_sec_local32": b["images_per_sec"],
       "sec_local8": a["sec_best"], "sec_local32": b["sec_best"]}
print(json.dumps(out))
open("BENCH_SCALING.json", "w").write(json.dumps(out) + "\n")
EOF
