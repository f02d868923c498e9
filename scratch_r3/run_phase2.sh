#!/bin/bash
# Phase 2 after the op grid: re-measure the rows the HTTP-413 bug cost,
# sweep small + headline buckets into the tuning table (now with the xla
# candidate), refresh the model benchmark (GAT + reddit2 + bf16 rows),
# and re-render the tuning report.
cd /root/repo

echo "=== spmm_static redo (reddit2/products, fresh process each) $(date) ==="
timeout 7200 python benchmarks/bench_ops.py --op spmm_static \
  --datasets reddit2 --features 32 64 128 --iters 50 \
  --out results/benchop_spmm_static.csv
echo "rc=$?"
timeout 7200 python benchmarks/bench_ops.py --op spmm_static \
  --datasets ogbn-products --features 32 64 128 --iters 8 \
  --out results/benchop_spmm_static.csv
echo "rc=$?"

echo "=== sweep small+mid buckets $(date) ==="
timeout 10800 python -m geot_tpu.tuning.sweep \
  --datasets cora citeseer pubmed amazon_photo ppi flickr ogbl-collab \
  --features 32 64 128 --iters 30
echo "rc=$?"

echo "=== sweep headline buckets $(date) ==="
timeout 10800 python -m geot_tpu.tuning.sweep \
  --datasets reddit2 ogbn-products --features 32 128 --iters 5
echo "rc=$?"

echo "=== model bench f32 $(date) ==="
timeout 7200 python benchmarks/bench_models.py \
  --models gcn gin graphsage gat --datasets flickr ogbn-arxiv \
  --hidden 32 64 --iters 50 --out results/model_result.csv
echo "rc=$?"
timeout 7200 python benchmarks/bench_models.py \
  --models gcn gin graphsage gat --datasets reddit2 \
  --hidden 32 64 --iters 8 --out results/model_result.csv
echo "rc=$?"

echo "=== model bench bf16 $(date) ==="
timeout 3600 python benchmarks/bench_models.py \
  --models gcn gat --datasets flickr ogbn-arxiv \
  --hidden 64 --iters 50 --dtype bf16 --out results/model_result.csv
echo "rc=$?"

echo "=== tuning report $(date) ==="
timeout 600 python -m geot_tpu.tuning.report || true
echo "ALL PHASE2 DONE"
