"""Clustered-vs-uniform curve at products scale (VERDICT r2 Next #5).

For mixing in argv (default 0.1 0.3 0.5 1.0): build the hybrid split, time
hybrid and pure-BAT on the same graph, append rows to
results/clustered_vs_uniform.csv (incremental writes)."""

import csv
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from geot_tpu.graph.datasets import synthetic_clustered_graph, DATASET_SHAPES
from geot_tpu.graph.plan import build_bat_plan
from geot_tpu.graph.stream_plan import (
    HybridPlan, build_stream_split_host, stream_plan_from_host, cell_census,
)
from geot_tpu.ops.api import _spmm_fwd_hybrid, _spmm_fwd_bat, _stream_sum
from geot_tpu.utils.timing import timeit

N = 128
OUT = "/root/repo/results/clustered_vs_uniform.csv"
FIELDS = ["dataset", "mixing", "N", "stream_frac", "frac_ge_128",
          "hybrid_ms", "bat_ms", "speedup", "stream_ms", "streamed_edges",
          "edges_per_s_hybrid"]


def run(mix: float):
    n_nodes, n_edges, _, _ = DATASET_SHAPES["ogbn-products"]
    t0 = time.time()
    g = synthetic_clustered_graph(
        n_nodes, n_edges, mixing=mix, mean_community=2000, power=1.0, seed=0
    )
    order = np.argsort(g.dst, kind="stable")
    dst, src = g.dst[order].astype(np.int64), g.src[order].astype(np.int64)
    rng = np.random.default_rng(0)
    w = rng.standard_normal(n_edges).astype(np.float32)
    census = cell_census(dst, src)
    families, rest_mask, stats = build_stream_split_host(  # round-4 API
        dst, src, n_nodes, n_nodes, edge_weight=w, feature_hint=N
    )
    print(f"mix={mix} build {time.time()-t0:.0f}s stats={stats}", flush=True)
    x = jnp.asarray(rng.standard_normal((n_nodes, N)).astype(np.float32))

    row = dict(dataset="ogbn-products", mixing=mix, N=N,
               stream_frac=round(stats.get("stream_frac", 0.0), 4),
               frac_ge_128=round(census["frac_ge_128"], 4))
    mct = max((1 << 30) // (N * 4 * 1024), 1)
    if families is not None:
        sp = tuple(stream_plan_from_host(a, m) for a, m in families)
        rest = rest_src = rest_w = None
        if rest_mask.any():
            rest = build_bat_plan(dst[rest_mask], n_nodes, e_tile=1024,
                                  s_tile=256, max_chunk_tiles=mct)
            rest_src = jnp.asarray(src[rest_mask].astype(np.int32))
            rest_w = jnp.asarray(w[rest_mask])
        hyb = HybridPlan(sp, rest, rest_src, rest_w)
        t_s = timeit(jax.jit(_stream_sum), sp, x, warmup=2, iters=8)
        t_h = timeit(jax.jit(_spmm_fwd_hybrid), hyb, x, warmup=2, iters=8)
        row["stream_ms"] = round(t_s * 1e3, 1)
        row["streamed_edges"] = sp.num_edges
        del hyb, rest, rest_src, rest_w, sp
    else:
        t_h = None
        row["stream_ms"] = ""
        row["streamed_edges"] = 0

    bat = build_bat_plan(dst, n_nodes, e_tile=1024, s_tile=256,
                         max_chunk_tiles=mct)
    srcj = jnp.asarray(src.astype(np.int32))
    wj = jnp.asarray(w)
    f_bat = jax.jit(functools.partial(_spmm_fwd_bat, token_gate=True))
    t_b = timeit(f_bat, bat, x, srcj, wj, warmup=2, iters=8)
    if t_h is None:
        t_h = t_b  # hybrid degenerates to BAT
    row.update(hybrid_ms=round(t_h * 1e3, 1), bat_ms=round(t_b * 1e3, 1),
               speedup=round(t_b / t_h, 2),
               edges_per_s_hybrid=round(n_edges / t_h / 1e6, 1))
    print("ROW", row, flush=True)
    new = not os.path.exists(OUT)
    with open(OUT, "a", newline="") as f:
        wtr = csv.DictWriter(f, FIELDS)
        if new:
            wtr.writeheader()
        wtr.writerow(row)


if __name__ == "__main__":
    mixes = [float(a) for a in sys.argv[1:]] or [0.1, 0.3, 0.5, 1.0]
    for m in mixes:
        run(m)
