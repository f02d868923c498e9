"""Products-scale measurement: hybrid stream+gather vs pure BAT+gather.

Clustered synthetic products (mixing=0.3, communities ~2000) AND the
round-2 uniform synthetic, both at (2.45M nodes, 61.9M edges, N=128, f32,
static weights)."""

import sys, time, functools
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from geot_tpu.graph.datasets import synthetic_clustered_graph, DATASET_SHAPES
from geot_tpu.graph.plan import build_bat_plan
from geot_tpu.graph.stream_plan import (
    HybridPlan, build_stream_split_host, stream_plan_from_host,
)
from geot_tpu.ops.api import _spmm_fwd_hybrid, _spmm_fwd_bat, _stream_sum
from geot_tpu.utils.timing import timeit

MIX = float(sys.argv[1]) if len(sys.argv) > 1 else 0.3
N = 128
n_nodes, n_edges, _, _ = DATASET_SHAPES["ogbn-products"]

t0 = time.time()
g = synthetic_clustered_graph(
    n_nodes, n_edges, mixing=MIX, mean_community=2000, power=1.0, seed=0
)
order = np.argsort(g.dst, kind="stable")
dst, src = g.dst[order].astype(np.int64), g.src[order].astype(np.int64)
rng = np.random.default_rng(0)
w = rng.standard_normal(n_edges).astype(np.float32)
print(f"gen+sort {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
families, rest_mask, stats = build_stream_split_host(  # round-4 API
    dst, src, n_nodes, n_nodes, edge_weight=w, feature_hint=N
)
print(f"split build {time.time()-t0:.1f}s stats={stats}", flush=True)

x = jnp.asarray(rng.standard_normal((n_nodes, N)).astype(np.float32))

if families is not None:
    sp = tuple(stream_plan_from_host(a, m) for a, m in families)
    rest = rest_src = rest_w = None
    if rest_mask.any():
        t0 = time.time()
        rest = build_bat_plan(
            dst[rest_mask], n_nodes, e_tile=1024, s_tile=256,
            max_chunk_tiles=max((1 << 30) // (N * 4 * 1024), 1),
        )
        rest_src = jnp.asarray(src[rest_mask].astype(np.int32))
        rest_w = jnp.asarray(w[rest_mask])
        print(f"rest bat build {time.time()-t0:.1f}s "
              f"({int(rest_mask.sum())} edges)", flush=True)
    hyb = HybridPlan(sp, rest, rest_src, rest_w)

    f_stream = jax.jit(_stream_sum)
    t = timeit(f_stream, sp, x, warmup=2, iters=8)
    print(f"stream-only: {t*1e3:.1f} ms ({sp.num_edges/t/1e6:.0f}M edges/s "
          f"over {sp.num_edges} streamed)", flush=True)

    f_hyb = jax.jit(_spmm_fwd_hybrid)
    t_h = timeit(f_hyb, hyb, x, warmup=2, iters=8)
    print(f"hybrid total: {t_h*1e3:.1f} ms ({n_edges/t_h/1e6:.0f}M edges/s)",
          flush=True)

    # spot correctness on 200 random rows
    out = np.asarray(f_hyb(hyb, x)[:, :N])
    rows = rng.integers(0, n_nodes, 200)
    xs = np.asarray(x)
    for r in rows[:5]:
        m = dst == r
        exp = (xs[src[m]] * w[m][:, None]).sum(axis=0)
        got = out[r]
        err = np.abs(got - exp).max() / (np.abs(exp).max() + 1e-9)
        assert err < 1e-3, (r, err)
    print("spot check ok", flush=True)

# pure BAT baseline on the same graph
t0 = time.time()
bat = build_bat_plan(
    dst, n_nodes, e_tile=1024, s_tile=256,
    max_chunk_tiles=max((1 << 30) // (N * 4 * 1024), 1),
)
print(f"full bat build {time.time()-t0:.1f}s", flush=True)
srcj = jnp.asarray(src.astype(np.int32))
wj = jnp.asarray(w)
f_bat = jax.jit(functools.partial(_spmm_fwd_bat, token_gate=True))
t_b = timeit(f_bat, bat, x, srcj, wj, warmup=2, iters=8)
print(f"pure BAT: {t_b*1e3:.1f} ms ({n_edges/t_b/1e6:.0f}M edges/s)", flush=True)
