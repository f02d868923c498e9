"""Post-fix headline: products-clustered hybrid SpMM, f32 + bf16, fresh
build under the round-5 cost model (rest 146 ms measured; stream constants
re-calibrated). Baseline r4: 537.7 ms f32."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from geot_tpu.graph.cache import cached_build
from geot_tpu.graph.datasets import DATASET_SHAPES, synthetic_clustered_graph
from geot_tpu.models.conv import prepare_graph
from geot_tpu.ops import api as ops
from geot_tpu.utils.timing import timeit

which = sys.argv[1] if len(sys.argv) > 1 else "clustered"
n_nodes, n_edges, _, _ = DATASET_SHAPES["ogbn-products"]
rng = np.random.default_rng(0)
w_host = rng.standard_normal(n_edges).astype(np.float32)


def build():
    if which == "clustered":
        d = synthetic_clustered_graph(
            n_nodes, n_edges, mixing=0.3, mean_community=2000, power=1.0,
            seed=0, name="ogbn-products-clustered")
        layouts = ("bat", "stream")
    else:
        from geot_tpu.graph.datasets import synthetic_graph

        d = synthetic_graph(n_nodes, n_edges, power=1.0, seed=0,
                            name="ogbn-products")
        layouts = ("bat", "stream")
    return prepare_graph(d.src, d.dst, n_nodes, add_self_loops=False,
                         edge_weight=w_host, layouts=layouts)


g = cached_build(f"bench-ogbn-products-{which}-N128-bat-stream", build)
if g.hyb is not None:
    fams = [(int(sp.e_tile), int(sp.num_tiles), int(sp.num_edges))
            for sp in g.hyb.stream]
    streamed = sum(f[2] for f in fams)
    rest_e = 0 if g.hyb.rest_src is None else int(g.hyb.rest_src.shape[0])
    print(f"families={fams}", flush=True)
    print(f"streamed={streamed} rest={rest_e} "
          f"frac={streamed/(streamed+rest_e):.3f}", flush=True)
else:
    print("hyb=None (pure BAT)", flush=True)

x = jnp.asarray(rng.standard_normal((n_nodes, 128)).astype(np.float32))
fn = jax.jit(lambda gg, x: ops.segment_spmm(gg, x, backend="pallas"))

import time


def robust(label, *a, iters=8):
    for attempt in range(3):
        try:
            return timeit(fn, *a, warmup=2, iters=iters)
        except Exception as e:
            print(f"# {label} attempt {attempt}: {type(e).__name__} "
                  f"{str(e)[:150]}", flush=True)
            time.sleep(20)
    return None


t = robust("f32", g, x)
if t:
    print(f"{which} f32: {t*1e3:7.1f} ms  {n_edges/t/1e6:.0f}M edges/s  "
          f"{t/n_edges*1e9:5.2f} ns/edge", flush=True)

tb = robust("bf16", g, x.astype(jnp.bfloat16))
if tb:
    print(f"{which} bf16: {tb*1e3:7.1f} ms  {n_edges/tb/1e6:.0f}M edges/s  "
          f"{tb/n_edges*1e9:5.2f} ns/edge", flush=True)

# correctness spot check f32 (200 random output rows vs numpy oracle)
d2 = np.asarray(g.dst)
s2 = np.asarray(g.src)
w2 = np.asarray(g.edge_weight)
out = np.asarray(fn(g, x))
xh = np.asarray(x, np.float64)
rows = np.random.default_rng(2).integers(0, n_nodes, 200)
bad = 0
worst = 0.0
for r in rows:
    sel = d2 == r
    want = (xh[s2[sel]] * w2[sel][:, None]).sum(axis=0)
    rel = np.max(np.abs(out[r] - want)) / (np.max(np.abs(want)) + 1e-9)
    worst = max(worst, float(rel))
    if not np.allclose(out[r], want, rtol=1e-4, atol=1e-4):
        bad += 1
        print(f"row {r}: deg={int(sel.sum())} rel_err={rel:.2e}", flush=True)
print(f"correctness: {200-bad}/200 rows within 1e-4; worst rel {worst:.2e}",
      flush=True)
