"""Rest-path executor candidates, measured on the products-clustered rest
(18.66M edges). probe_rest3 established: materialized gather ~11-13.5
ns/row in every context; gather fused into a reduction ~4.8 ns/row. The
BAT kernel forces materialization (pallas operands). Candidates that avoid
it, plus small-tile stream constants for shrinking the rest:

  A. scatter_fused — scan over chunks; body = carry.at[dst].add(x[src]*w)
     (ONE fused gather-mul-scatter per chunk, nothing materialized)
  B. scatter_big — one whole-rest carry.at[dst].add(x[src]*w)
  C. stream tile-cost at E in {64,128,256} (full fill, synthetic) — extends
     the per-cell cost model below E=256 so mid-density cells can stream
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from geot_tpu.graph.cache import cached_build
from geot_tpu.graph.datasets import DATASET_SHAPES, synthetic_clustered_graph
from geot_tpu.models.conv import prepare_graph
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
hyb = g.hyb
rest_src = np.asarray(hyb.rest_src)
nre = len(rest_src)
# recover rest dst from the rest BatPlan dst3? Simpler: recompute the mask
# from the production splitter on the host edge arrays.
print(f"rest edges={nre}", flush=True)


def robust(label, fn, *a, iters=8):
    import time
    for attempt in range(3):
        try:
            return timeit(fn, *a, warmup=2, iters=iters)
        except Exception as e:
            print(f"# {label} attempt {attempt}: {type(e).__name__} "
                  f"{str(e)[:120]}", flush=True)
            time.sleep(20)
    return None


# rest dst ids: rebuild the split mask on host (same inputs as build)
from geot_tpu.graph.stream_plan import build_stream_split_host

d = synthetic_clustered_graph(
    n_nodes, n_edges, mixing=0.3, mean_community=2000, power=1.0,
    seed=0, name="ogbn-products-clustered")
order = np.argsort(d.dst, kind="stable")
dst_s, src_s = d.dst[order], d.src[order]
_, rest_mask, _ = build_stream_split_host(
    dst_s, src_s, n_nodes, n_nodes, edge_weight=w_host[order],
    feature_hint=128)
r_dst = dst_s[rest_mask].astype(np.int32)
r_src = src_s[rest_mask].astype(np.int32)
r_w = w_host[order][rest_mask]
print(f"recomputed rest={len(r_dst)} (plan said {nre})", flush=True)
NR = len(r_dst)

C = 1 << 21  # 2M-edge chunks
n_c = -(-NR // C)
pad = n_c * C - NR
dj = jnp.asarray(np.pad(r_dst, (0, pad), constant_values=n_nodes))  # OOB pad drops
sj = jnp.asarray(np.pad(r_src, (0, pad)))
wj = jnp.asarray(np.pad(r_w, (0, pad)))


def scatter_fused(x, dj, sj, wj):
    def body(carry, c):
        d_sl = jax.lax.dynamic_slice_in_dim(dj, c * C, C)
        s_sl = jax.lax.dynamic_slice_in_dim(sj, c * C, C)
        w_sl = jax.lax.dynamic_slice_in_dim(wj, c * C, C)
        carry = carry.at[d_sl].add(x[s_sl] * w_sl[:, None], mode="drop")
        return carry, None

    carry, _ = jax.lax.scan(
        body, jnp.zeros((n_nodes, 128), jnp.float32),
        jnp.arange(n_c, dtype=jnp.int32),
    )
    return carry


t = robust("scatter_fused", jax.jit(scatter_fused), x, dj, sj, wj)
t and print(f"scatter_fused: {t*1e3:7.1f} ms  {t/NR*1e9:5.2f} ns/edge",
            flush=True)


def scatter_big(x, dj, sj, wj):
    return jnp.zeros((n_nodes, 128), jnp.float32).at[dj].add(
        x[sj] * wj[:, None], mode="drop"
    )


t = robust("scatter_big", jax.jit(scatter_big), x, dj, sj, wj)
t and print(f"scatter_big: {t*1e3:7.1f} ms  {t/NR*1e9:5.2f} ns/edge",
            flush=True)

# segment_sum on sorted dst (per chunk materializes vals — control)
def segsum_fused(x, dj, sj, wj):
    def body(carry, c):
        d_sl = jax.lax.dynamic_slice_in_dim(dj, c * C, C)
        s_sl = jax.lax.dynamic_slice_in_dim(sj, c * C, C)
        w_sl = jax.lax.dynamic_slice_in_dim(wj, c * C, C)
        part = jax.ops.segment_sum(
            x[s_sl] * w_sl[:, None], d_sl, num_segments=n_nodes,
            indices_are_sorted=True,
        )
        return carry + part, None

    carry, _ = jax.lax.scan(
        body, jnp.zeros((n_nodes, 128), jnp.float32),
        jnp.arange(n_c, dtype=jnp.int32),
    )
    return carry


t = robust("segsum_fused", jax.jit(segsum_fused), x, dj, sj, wj, iters=4)
t and print(f"segsum_fused: {t*1e3:7.1f} ms  {t/NR*1e9:5.2f} ns/edge",
            flush=True)

# C. stream kernel cost at small E (full-fill synthetic tiles)
from geot_tpu.ops.pallas_segment import stream_segment_acc

S, XR, F = 256, 256, 128
for E in (64, 128, 256, 512):
    T = max(1 << 22 >> E.bit_length(), 4096)  # ~enough tiles to time
    T = 16384
    ob_h = np.sort(rng.integers(0, 64, T)).astype(np.int32)
    sb_h = rng.integers(0, 64, T).astype(np.int32)
    dst_h = (
        np.sort(rng.integers(0, S, (T, 1, E)), axis=2) + ob_h[:, None, None] * S
    ).astype(np.int32)
    srcl_h = rng.integers(0, XR, (T, 1, E)).astype(np.int32)
    w3_h = rng.standard_normal((T, 1, E)).astype(np.float32)
    xs = jnp.asarray(rng.standard_normal((64 * XR, F)).astype(np.float32))
    carry0 = jnp.zeros((64 * S, F), jnp.float32)
    args = tuple(map(jnp.asarray, (ob_h, sb_h, dst_h, srcl_h)))
    w3 = jnp.asarray(w3_h)
    fn = jax.jit(
        lambda ob, sb, d3, sl, xs, c0, w3: stream_segment_acc(
            ob, sb, d3, sl, xs, c0, w3, s_tile=S, x_rows=XR
        )
    )
    t = robust(f"stream_E{E}", fn, *args, xs, carry0, w3)
    if t:
        ns_slot = t / (T * E) * 1e9
        ns_tile = t / T * 1e9
        print(
            f"stream E={E:4d}: {t*1e3:7.2f} ms  {ns_slot:5.2f} ns/slot  "
            f"{ns_tile:7.1f} ns/tile", flush=True,
        )
