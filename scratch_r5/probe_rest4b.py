"""Rest-path executor candidates (see probe_rest4.py header) — standalone:
no Graph/cached_build (the 21-minute device transfer of plans parts A-C
never touch). Rest edge arrays cached to scratch_r5/rest_edges.npz.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(HERE, "rest_edges.npz")

if os.path.exists(CACHE):
    z = np.load(CACHE)
    r_dst, r_src, r_w = z["r_dst"], z["r_src"], z["r_w"]
    n_nodes = int(z["n_nodes"])
else:
    from geot_tpu.graph.datasets import DATASET_SHAPES, synthetic_clustered_graph
    from geot_tpu.graph.stream_plan import build_stream_split_host

    n_nodes, n_edges, _, _ = DATASET_SHAPES["ogbn-products"]
    rng0 = np.random.default_rng(0)
    w_host = rng0.standard_normal(n_edges).astype(np.float32)
    d = synthetic_clustered_graph(
        n_nodes, n_edges, mixing=0.3, mean_community=2000, power=1.0,
        seed=0, name="ogbn-products-clustered")
    order = np.argsort(d.dst, kind="stable")
    dst_s, src_s = d.dst[order], d.src[order]
    _, rest_mask, st = build_stream_split_host(
        dst_s, src_s, n_nodes, n_nodes, edge_weight=w_host[order],
        feature_hint=128)
    r_dst = dst_s[rest_mask].astype(np.int32)
    r_src = src_s[rest_mask].astype(np.int32)
    r_w = w_host[order][rest_mask]
    np.savez(CACHE, r_dst=r_dst, r_src=r_src, r_w=r_w, n_nodes=n_nodes)

NR = len(r_dst)
print(f"rest edges={NR}", flush=True)

import jax
import jax.numpy as jnp

from geot_tpu.utils.timing import timeit

rng = np.random.default_rng(1)
x = jnp.asarray(rng.standard_normal((n_nodes, 128)).astype(np.float32))


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


C = 1 << 21  # 2M-edge chunks
n_c = -(-NR // C)
pad = n_c * C - NR
dj = jnp.asarray(np.pad(r_dst, (0, pad), constant_values=n_nodes))
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
    # bf16 x variant (the new 2-pass fast path)
    fnb = jax.jit(
        lambda ob, sb, d3, sl, xs, c0, w3: stream_segment_acc(
            ob, sb, d3, sl, xs, c0, w3, s_tile=S, x_rows=XR
        )
    )
    tb = robust(f"stream_bf16_E{E}", fnb, *args, xs.astype(jnp.bfloat16),
                carry0, w3)
    if tb:
        print(
            f"stream bf16 E={E:4d}: {tb*1e3:7.2f} ms  "
            f"{tb/(T*E)*1e9:5.2f} ns/slot  {tb/T*1e9:7.1f} ns/tile",
            flush=True,
        )
