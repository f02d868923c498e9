"""Reproduce + fix the bf16 stream-kernel MosaicError (VERDICT r4 Missing #4).

Variants tried, smallest first:
  A. stream_segment_acc with x bf16, carry f32      (likely fine: only the
     select dot changes dtype)
  B. stream_segment_acc with x bf16, carry bf16     (aliased (16,128)-tiled
     bf16 carry block — suspected crash source)
  C. stream_segment_sum with x bf16 (no aliasing)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from geot_tpu.ops.pallas_segment import stream_segment_acc, stream_segment_sum

S, XR, E, F = 256, 256, 512, 128
T = 8
rng = np.random.default_rng(0)
ob = jnp.asarray(np.sort(rng.integers(0, 2, T)).astype(np.int32))
sb = jnp.asarray(rng.integers(0, 2, T).astype(np.int32))
dst_h = np.full((T, 1, E), -1, np.int32)
srcl_h = np.full((T, 1, E), -1, np.int32)
ob_h = np.asarray(ob)
for t in range(T):
    k = rng.integers(E // 2, E)
    dst_h[t, 0, :k] = np.sort(rng.integers(0, S, k)) + ob_h[t] * S
    srcl_h[t, 0, :k] = rng.integers(0, XR, k)
dst3 = jnp.asarray(dst_h)
srcl3 = jnp.asarray(srcl_h)
x_f32 = jnp.asarray(rng.standard_normal((2 * XR, F)).astype(np.float32))
w3 = jnp.asarray(rng.standard_normal((T, 1, E)).astype(np.float32))


def oracle(x):
    out = np.zeros((2 * S, F), np.float64)
    xh = np.asarray(x, np.float64)
    for t in range(T):
        for e in range(E):
            s_ = srcl_h[t, 0, e]
            d = dst_h[t, 0, e]
            if s_ >= 0 and d >= 0:
                out[d] += float(np.asarray(w3)[t, 0, e]) * xh[
                    int(np.asarray(sb)[t]) * XR + s_
                ]
    return out


ref = oracle(x_f32)


def try_case(label, fn):
    try:
        out = jax.jit(fn)()
        out.block_until_ready()
        err = float(
            np.max(np.abs(np.asarray(out, np.float64)[: 2 * S] - ref))
            / (np.max(np.abs(ref)) + 1e-9)
        )
        print(f"{label}: OK rel_err={err:.3e}", flush=True)
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)


xb = x_f32.astype(jnp.bfloat16)

try_case(
    "A x=bf16 carry=f32",
    lambda: stream_segment_acc(
        ob, sb, dst3, srcl3, xb, jnp.zeros((2 * S, F), jnp.float32), w3,
        s_tile=S, x_rows=XR),
)
try_case(
    "B x=bf16 carry=bf16",
    lambda: stream_segment_acc(
        ob, sb, dst3, srcl3, xb, jnp.zeros((2 * S, F), jnp.bfloat16), w3,
        s_tile=S, x_rows=XR),
)
try_case(
    "C sum x=bf16",
    lambda: stream_segment_sum(
        ob, sb, dst3 - (ob[:, None, None] * 0), srcl3, xb, w3,
        s_tile=S, x_rows=XR, n_blocks=2),
)
try_case(
    "D x=f32 carry=f32 (control)",
    lambda: stream_segment_acc(
        ob, sb, dst3, srcl3, x_f32, jnp.zeros((2 * S, F), jnp.float32), w3,
        s_tile=S, x_rows=XR),
)
