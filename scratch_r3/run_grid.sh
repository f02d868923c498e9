#!/bin/bash
# full op-benchmark grid (VERDICT r2 task #3) — sequential to avoid TPU contention
cd /root/repo
DS="cora citeseer pubmed amazon_photo ppi flickr ogbn-arxiv ogbl-collab reddit2 ogbn-products"
for OP in spmm_static spmm index_scatter sddmm; do
  echo "=== OP $OP $(date) ==="
  timeout 7200 python benchmarks/bench_ops.py --op $OP --datasets $DS \
    --features 32 64 128 --iters 50 --out results/benchop_${OP}.csv
  echo "=== $OP rc=$? $(date) ==="
done
echo ALL DONE
