"""Dissect the hybrid REST path (BAT+gather over the residue edges) at
products-clustered: where do 19 ns/edge go?  Variants:
  real      — the production rest path (random gather from the 1.25 GB table)
  seqidx    — same kernel, src replaced by a sequential ramp (gather becomes
              near-sequential reads): isolates the randomness premium
  bf16x     — gather from a bf16 copy of the table (halved gather bytes)
  kernelown — BAT kernel fed by zeros-gather (x[0:size] slice, no gather at
              all): the kernel-only floor
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
assert g.hyb is not None and g.hyb.rest is not None
rest = g.hyb.rest
nre = g.hyb.rest_src.shape[0]
print(f"rest: edges={nre} tiles={rest.num_tiles} e_tile={rest.e_tile} "
      f"vblocks={rest.n_vblocks} fill={nre/(rest.n_vblocks*rest.e_tile):.2f} "
      f"tiles/vblock={rest.num_tiles/rest.n_vblocks:.2f} "
      f"chunks={len(rest.chunks)}", flush=True)


def robust(label, fn, *a, **k):
    for attempt in range(3):
        try:
            return timeit(fn, *a, **k)
        except Exception as e:
            print(f"# {label} attempt {attempt}: {type(e).__name__} "
                  f"{str(e)[:90]}", flush=True)
            time.sleep(30)
    return None


def report(label, t):
    if t is not None:
        print(f"{label}: {t*1e3:.1f} ms ({t/nre*1e9:.2f} ns/edge)", flush=True)


f_real = jax.jit(lambda r, rs, rw, x: ops._spmm_fwd_bat(r, x, rs, rw))
report("real", robust("real", f_real, rest, g.hyb.rest_src, g.hyb.rest_w, x,
                      warmup=2, iters=8))

seq = jnp.arange(nre, dtype=jnp.int32) % n_nodes
report("seqidx", robust("seqidx", f_real, rest, seq, g.hyb.rest_w, x,
                        warmup=2, iters=8))

xb = x.astype(jnp.bfloat16)
f_bf = jax.jit(
    lambda r, rs, rw, xb: ops._spmm_fwd_bat(r, xb.astype(jnp.float32), rs, rw)
)
# NOTE: astype before the gather would defeat the point; gather from bf16:
f_bf2 = jax.jit(
    lambda r, rs, rw, xb: ops._spmm_fwd_bat(r, xb, rs, rw)
)
report("bf16x", robust("bf16x", f_bf2, rest, g.hyb.rest_src, g.hyb.rest_w, xb,
                       warmup=2, iters=8))
