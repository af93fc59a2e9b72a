#!/usr/bin/env bash
# Two-cluster-size scaling harness (north rule: throughput scaling
# efficiency >=0.8 from N to 4N executors, evidenced in this sandbox by the
# same spark-submit job at two parallelism levels on the same input).
#
# Usage: submit/run_two_sizes.sh [n_pages] [filler_bytes] [seed_stride]
set -euo pipefail
cd "$(dirname "$0")/.."

N_PAGES=${1:-120000}
FILLER=${2:-6144}
STRIDE=${3:-11}
ZIP=/tmp/secretscraper_spark.zip

rm -f "$ZIP"
zip -qr "$ZIP" secretscraper_spark

run() { # run <master> <shuffle_partitions> <cpuset>
  # task.cpus=1: at these partial-host parallelism levels the Python
  # workers are the bottleneck (see BASELINE.md task-slot sizing note).
  # taskset pins the whole job (JVM, Python workers, GC) to exactly its
  # nominal core count — a real executor is a CPU-capped container, and
  # unpinned local[2] borrows extra host cores for auxiliary threads,
  # structurally deflating the N->4N ratio (see bench.py).
  taskset -c "$3" spark-submit --master "$1" \
    --conf spark.sql.shuffle.partitions="$2" \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.driver.memory=24g \
    --py-files "$ZIP" \
    submit/crawl_job.py \
    --n-pages "$N_PAGES" --filler-bytes "$FILLER" --seed-stride "$STRIDE" \
    2>/dev/null | tail -1
}

LO_JSON=$(run 'local[2]' 4 0-1)
HI_JSON=$(run 'local[8]' 8 0-7)

python - "$LO_JSON" "$HI_JSON" <<'EOF'
import json, sys
lo, hi = json.loads(sys.argv[1]), json.loads(sys.argv[2])
eff = (hi["pages_per_sec"] / lo["pages_per_sec"]) / 4.0
print(json.dumps({
    "low": lo, "high": hi, "cores_ratio": 4.0,
    "scaling_efficiency": round(eff, 3),
}))
EOF
