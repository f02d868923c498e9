#!/bin/bash
# Round-5 campaign part C: re-grid the points affected by the
# plan-packedness fix (build_graph now honors the table winner's
# packedness — collab N=8's plain-bat winner ran packed in part B) and
# re-measure the citeseer noise-floor cell.
set -u
cd "$(dirname "$0")/.."
LOG=scratch_r5/campaign
mkdir -p $LOG results
: "${CAMPAIGN_STAGE_TIMEOUT:=7200}"

run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a $LOG/campaign.log
  timeout "$CAMPAIGN_STAGE_TIMEOUT" "$@" > >(grep --line-buffered -v -E "^WARNING|axon_|Source Location" | tee $LOG/$name.log) 2>&1
  echo "=== $name done rc=$? ($(date +%H:%M:%S))" | tee -a $LOG/campaign.log
}

python - <<'EOF'
import csv, os
DROP = {"citeseer", "ogbl-collab", "pubmed"}
for path in ("results/benchop_spmm_static.csv", "results/benchop_spmm.csv"):
    if not os.path.exists(path):
        continue
    rows = [r for r in csv.DictReader(open(path)) if r["dataset"] not in DROP]
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    print(path, "filtered to", len(rows), "rows")
EOF
run regrid_static_c python benchmarks/bench_ops.py --op spmm_static \
  --datasets citeseer pubmed ogbl-collab \
  --features 8 32 128 --iters 30 --out results/benchop_spmm_static.csv
run regrid_dyn_c python benchmarks/bench_ops.py --op spmm \
  --datasets citeseer pubmed ogbl-collab \
  --features 8 32 128 --iters 30 --out results/benchop_spmm.csv

python scripts/check_grids.py | tee $LOG/final_audit.log

echo "CAMPAIGN C COMPLETE $(date)" | tee -a $LOG/campaign.log
