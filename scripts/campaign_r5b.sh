#!/bin/bash
# Round-5 campaign part B: post-fix re-measurements.
#  - re-sweep small datasets with the noise-floor tie-break + N=8 coverage
#  - reddit2 sweep (subset-row oracle fix)
#  - re-grid the datasets whose dispatch changed (crossover -> plain xla)
#  - SDDMM grid with the Pallas kernel variant (+ chunked reddit2)
#  - per-part interior stream-vs-BAT probe (multichip evidence)
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

run resweep_small python -m geot_tpu.tuning.sweep --fast \
  --datasets cora citeseer pubmed amazon_photo flickr ogbl-collab \
  --features 8 32 128 --ops spmm spmm_dyn --iters 20 \
  --out geot_tpu/tuning/table.json --results-dir results

# index_scatter buckets were swept pre-fix too (xla candidate mis-routed
# through the slot-array scatter) — re-measure them
run resweep_iscat python -m geot_tpu.tuning.sweep --fast \
  --datasets cora citeseer pubmed flickr ogbl-collab \
  --features 32 128 --ops index_scatter --iters 20 \
  --out geot_tpu/tuning/table.json --results-dir results

run sweep_reddit2 python -m geot_tpu.tuning.sweep --fast \
  --datasets reddit2 --features 128 --ops spmm spmm_dyn --iters 8 \
  --out geot_tpu/tuning/table.json --results-dir results

# re-grid the affected datasets (drop their old rows first)
python - <<'EOF'
import csv, os
DROP = {"cora", "citeseer", "pubmed", "amazon_photo", "ogbl-collab"}
for path in ("results/benchop_spmm_static.csv", "results/benchop_spmm.csv",
             "results/benchop_index_scatter.csv"):
    if not os.path.exists(path):
        continue
    rows = [r for r in csv.DictReader(open(path)) if r["dataset"] not in DROP]
    if rows:
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)
    print(path, "filtered to", len(rows), "rows")
EOF
run regrid_static python benchmarks/bench_ops.py --op spmm_static \
  --datasets cora citeseer pubmed amazon_photo ogbl-collab \
  --features 8 32 128 --iters 30 --out results/benchop_spmm_static.csv
run regrid_dyn python benchmarks/bench_ops.py --op spmm \
  --datasets cora citeseer pubmed amazon_photo ogbl-collab \
  --features 8 32 128 --iters 30 --out results/benchop_spmm.csv
run regrid_iscat python benchmarks/bench_ops.py --op index_scatter \
  --datasets cora citeseer pubmed amazon_photo ogbl-collab \
  --features 32 128 --iters 30 --out results/benchop_index_scatter.csv

# mh grid re-run: the flat-lane _mh_fwd layout (no per-head 128 padding)
# replaced the measured code
rm -f results/benchop_mh_spmm.csv
run mh4b python benchmarks/bench_ops.py --op mh_spmm --heads 4 \
  --datasets flickr ogbn-arxiv reddit2 --features 16 32 --iters 20 \
  --out results/benchop_mh_spmm.csv
run mh8b python benchmarks/bench_ops.py --op mh_spmm --heads 8 \
  --datasets flickr ogbn-arxiv reddit2 --features 16 --iters 20 \
  --out results/benchop_mh_spmm.csv

# SDDMM grid with the Pallas kernel (first kernel rows) + chunked reddit2
rm -f results/benchop_sddmm.csv
run sddmm2 python benchmarks/bench_ops.py --op sddmm \
  --datasets cora citeseer pubmed amazon_photo ppi flickr ogbn-arxiv ogbl-collab reddit2 \
  --features 32 128 --iters 30 --out results/benchop_sddmm.csv

# reddit2 model re-run: the interpolated 'sr' prefer mis-routed the model
# path (clamped now) and gin init OOM killed the stage mid-dataset
python - <<'EOF'
import csv, os
path = "results/model_result.csv"
if os.path.exists(path):
    rows = [r for r in csv.DictReader(open(path)) if r["dataset"] != "reddit2"]
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    print(path, "filtered to", len(rows), "rows")
EOF
run models_reddit2 python benchmarks/bench_models.py \
  --models gcn gin graphsage gat --datasets reddit2 \
  --hidden 32 64 --iters 30 --out results/model_result.csv

# the uniform locality point died on a stale assertion in campaign A
run clustered_uniform python benchmarks/bench_clustered.py \
  --mixings 1.0 --iters 8 --out results/clustered_vs_uniform.csv

run part_interior python scratch_r5/probe_part_interior.py

echo "CAMPAIGN B COMPLETE $(date)" | tee -a $LOG/campaign.log
