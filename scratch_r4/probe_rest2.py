"""Decompose the 415 ms REST path (products-clustered residue, 21.7M edges):
standalone gather runs at 4.74 ns/row (scratch_r4/gather_range.log), so the
modeled floor is ~210 ms.  Which half eats the other ~200?

  gather_scan — the scan structure with ONLY the per-chunk gather
                (dynamic-slice idx -> x[idx] -> running sum; no kernel)
  kernel_scan — the production _bat_sum/_bat_sum_scan with vals_fn serving
                a PRE-MATERIALIZED single-chunk buffer (sequential slice,
                no gather)
  gather_big  — one whole-array gather x[rest_src] reduced to a sum
                (rate check vs the 4M-row probe)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from geot_tpu.graph.cache import cached_build
from geot_tpu.graph.datasets import DATASET_SHAPES, synthetic_clustered_graph
from geot_tpu.models.conv import prepare_graph
from geot_tpu.ops import api as ops
from geot_tpu.utils.timing import timeit

n_nodes, n_edges, _, _ = DATASET_SHAPES["ogbn-products"]
rng = np.random.default_rng(0)
w_host = rng.standard_normal(n_edges).astype(np.float32)


def build():
    d = synthetic_clustered_graph(
        n_nodes, n_edges, mixing=0.3, mean_community=2000, power=1.0,
        seed=0, name="ogbn-products-clustered")
    return prepare_graph(d.src, d.dst, n_nodes, add_self_loops=False,
                         edge_weight=w_host, layouts=("bat", "stream"))


g = cached_build("bench-ogbn-products-clustered-N128-bat-stream", build)
x = jnp.asarray(rng.standard_normal((n_nodes, 128)).astype(np.float32))
rest = g.hyb.rest
rest_src = g.hyb.rest_src
nre = rest_src.shape[0]
E = rest.e_tile
C = len(rest.chunks)
T_c = rest.chunks[0][1] - rest.chunks[0][0]
nblk = T_c + 1
size = nblk * E
print(f"rest edges={nre} E={E} chunks={C} T_c={T_c} chunk rows={size}",
      flush=True)


def robust(label, fn, *a, **k):
    for attempt in range(3):
        try:
            return timeit(fn, *a, **k)
        except Exception as e:
            print(f"# {label} attempt {attempt}: {type(e).__name__} "
                  f"{str(e)[:90]}", flush=True)
            time.sleep(30)
    return None


def report(label, t, rows):
    if t is not None:
        print(f"{label}: {t*1e3:.1f} ms ({t/rows*1e9:.2f} ns/row)", flush=True)


# --- gather_scan: per-chunk dynamic-slice + gather + sum, under lax.scan ---
vb2 = rest.vblock.reshape(C, T_c)
vbase_host = jnp.where(vb2[:, 0] >= rest.n_vblocks, rest.n_vblocks, vb2[:, 0])


def gather_scan(x, src, vbases):
    src_pad = jnp.pad(src, (0, size))

    def body(acc, vb0):
        idx = jax.lax.dynamic_slice_in_dim(src_pad, vb0 * E, size)
        acc = acc + jnp.sum(x[idx], axis=0)
        return acc, None

    acc, _ = jax.lax.scan(body, jnp.zeros((x.shape[1],), x.dtype), vbases)
    return acc


t = robust("gather_scan", jax.jit(gather_scan), x, rest_src, vbase_host,
           warmup=2, iters=8)
report("gather_scan", t, C * size)

# --- gather_big: one whole-array gather, summed ---
t = robust("gather_big", jax.jit(lambda x, s: jnp.sum(x[s], axis=0)),
           x, rest_src, warmup=2, iters=8)
report("gather_big", t, nre)

# --- gather_mat_scan: per-chunk gather MATERIALIZED (like production: the
# gathered block is written to HBM then consumed), consumed by a cheap sum
def gather_mat_scan(x, src, vbases):
    src_pad = jnp.pad(src, (0, size))

    def body(acc, vb0):
        idx = jax.lax.dynamic_slice_in_dim(src_pad, vb0 * E, size)
        v = jax.lax.optimization_barrier(x[idx])
        acc = acc + jnp.sum(v, axis=0)
        return acc, None

    acc, _ = jax.lax.scan(body, jnp.zeros((x.shape[1],), x.dtype), vbases)
    return acc


t = robust("gather_mat_scan", jax.jit(gather_mat_scan), x, rest_src,
           vbase_host, warmup=2, iters=8)
report("gather_mat_scan", t, C * size)

# --- kernel_scan: production BAT scan fed by a fixed pre-gathered buffer ---
v0 = jnp.asarray(
    rng.standard_normal((size, 128)).astype(np.float32)
)


def kernel_only(rest, v0, rw):
    return ops._bat_sum_scan(
        rest, lambda vb, sz, tok: v0, 128, rw
    )


t = robust("kernel_scan", jax.jit(kernel_only), rest, v0, g.hyb.rest_w,
           warmup=2, iters=8)
report("kernel_scan (per edge)", t, nre)
