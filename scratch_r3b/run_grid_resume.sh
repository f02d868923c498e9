#!/bin/bash
# Resume the op-benchmark grid (VERDICT r2 task #3): fill cells the
# Aug-18 run did not reach (salvaged rows live in results/benchop_*.csv).
# Fresh process per invocation; incremental CSV appends survive crashes.
cd /root/repo
B="python benchmarks/bench_ops.py"
set -x
timeout 1800 $B --op spmm --datasets ppi --features 128 --iters 30 --out results/benchop_spmm.csv
timeout 3600 $B --op spmm --datasets flickr ogbn-arxiv ogbl-collab --features 32 64 128 --iters 30 --out results/benchop_spmm.csv
timeout 5400 $B --op spmm --datasets reddit2 ogbn-products --features 32 64 128 --iters 8 --out results/benchop_spmm.csv
timeout 3600 $B --op index_scatter --datasets cora citeseer pubmed amazon_photo ppi flickr ogbn-arxiv ogbl-collab --features 32 64 128 --iters 30 --out results/benchop_index_scatter.csv
timeout 3600 $B --op sddmm --datasets cora citeseer pubmed amazon_photo ppi flickr ogbn-arxiv ogbl-collab --features 32 64 128 --iters 30 --out results/benchop_sddmm.csv
timeout 1800 $B --op sddmm --datasets reddit2 --features 32 64 128 --iters 8 --out results/benchop_sddmm.csv
timeout 3600 $B --op spmm_static --datasets reddit2 ogbn-products --features 32 64 128 --iters 8 --out results/benchop_spmm_static.csv
echo "GRID RESUME DONE rc=$?"
