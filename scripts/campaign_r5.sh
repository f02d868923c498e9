#!/bin/bash
# Round-5 measurement campaign (VERDICT r4 Next #3/#4/#6): regenerate the
# COMPLETE corpus — tuning re-sweep, op grids (incl. the first-ever SDDMM
# and mh_spmm rows), model benchmarks, clustered-vs-uniform locality grid.
# Run on the real TPU; every stage appends incrementally so a tunnel flap
# costs one point, not the campaign. Logs to scratch_r5/campaign/.
set -u
cd "$(dirname "$0")/.."
LOG=scratch_r5/campaign
mkdir -p $LOG results

run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a $LOG/campaign.log
  timeout "$CAMPAIGN_STAGE_TIMEOUT" "$@" > >(grep --line-buffered -v -E "^WARNING|axon_|Source Location" | tee $LOG/$name.log) 2>&1
  echo "=== $name done rc=$? ($(date +%H:%M:%S))" | tee -a $LOG/campaign.log
}

: "${CAMPAIGN_STAGE_TIMEOUT:=7200}"

# 1. tuning re-sweep (fast space; winners + spmm_hyb verdicts -> table.json,
#    ablation/sensitivity artifacts -> results/)
rm -f results/tuning_ablation.csv results/config_sensitivity.csv
run sweep_main python -m geot_tpu.tuning.sweep --fast \
  --datasets cora pubmed amazon_photo flickr ppi ogbl-collab rmat-s17 \
  --features 32 128 --ops spmm spmm_dyn --iters 20 \
  --out geot_tpu/tuning/table.json --results-dir results
run sweep_iscat python -m geot_tpu.tuning.sweep --fast \
  --datasets cora pubmed flickr ogbl-collab \
  --features 32 128 --ops index_scatter --iters 20 \
  --out geot_tpu/tuning/table.json --results-dir results
run sweep_reddit python -m geot_tpu.tuning.sweep --fast \
  --datasets reddit2 --features 128 --ops spmm spmm_dyn --iters 8 \
  --out geot_tpu/tuning/table.json --results-dir results

# 2. SDDMM grid (first measured rows — replaces PARITY.md's claim)
rm -f results/benchop_sddmm.csv
run sddmm python benchmarks/bench_ops.py --op sddmm \
  --datasets cora citeseer pubmed amazon_photo ppi flickr ogbn-arxiv ogbl-collab reddit2 \
  --features 32 128 --iters 30 --out results/benchop_sddmm.csv

# 3. static-weight spmm grid (the model path; auto must win/tie every point)
rm -f results/benchop_spmm_static.csv
run spmm_static python benchmarks/bench_ops.py --op spmm_static \
  --datasets cora citeseer pubmed amazon_photo ppi flickr ogbn-arxiv ogbl-collab rmat-s17 reddit2 \
  --features 8 32 128 --iters 30 --out results/benchop_spmm_static.csv

# 4. dynamic-weight spmm grid (complete 9-dataset coverage)
rm -f results/benchop_spmm.csv
run spmm_dyn python benchmarks/bench_ops.py --op spmm \
  --datasets cora citeseer pubmed amazon_photo ppi flickr ogbn-arxiv ogbl-collab rmat-s17 reddit2 \
  --features 8 32 128 --iters 30 --out results/benchop_spmm.csv

# 5. index_scatter grid (reference's 8-dataset sweep)
rm -f results/benchop_index_scatter.csv
run iscat python benchmarks/bench_ops.py --op index_scatter \
  --datasets cora citeseer pubmed amazon_photo ppi flickr ogbn-arxiv ogbl-collab \
  --features 32 128 --iters 30 --out results/benchop_index_scatter.csv

# 6. multi-head spmm (GAT aggregation; BASELINE config #4 shape)
rm -f results/benchop_mh_spmm.csv
run mh4 python benchmarks/bench_ops.py --op mh_spmm --heads 4 \
  --datasets flickr ogbn-arxiv reddit2 --features 16 32 --iters 20 \
  --out results/benchop_mh_spmm.csv
run mh8 python benchmarks/bench_ops.py --op mh_spmm --heads 8 \
  --datasets flickr ogbn-arxiv reddit2 --features 16 --iters 20 \
  --out results/benchop_mh_spmm.csv

# 7. end-to-end models incl. GAT and reddit2
rm -f results/model_result.csv
run models python benchmarks/bench_models.py \
  --models gcn gin graphsage gat --datasets flickr ogbn-arxiv reddit2 \
  --hidden 32 64 --iters 30 --out results/model_result.csv

# 8. clustered-vs-uniform locality grid (products shape)
rm -f results/clustered_vs_uniform.csv
run clustered python benchmarks/bench_clustered.py \
  --mixings 0.1 0.3 0.5 1.0 --iters 8 --out results/clustered_vs_uniform.csv

echo "CAMPAIGN COMPLETE $(date)" | tee -a $LOG/campaign.log
