"""Resolve the materialized-gather rate contradiction: r4 probe_gather_range
measured full_mat (4M uniform idx, materialized) at 4.74 ns/row; today's
g_std_2M/4.7M (rest-edge src idx) measured ~11. Same table, same chip.
Variables: index COUNT (4M vs 2.1/4.7M), index DISTRIBUTION (uniform vs
clustered rest srcs), session state.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from geot_tpu.utils.timing import timeit

N_ROWS = 2_449_029
F = 128
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((N_ROWS, F)).astype(np.float32))
z = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "rest_edges.npz"))
r_src = z["r_src"]


def robust(label, fn, *a, iters=10):
    import time
    for attempt in range(3):
        try:
            return timeit(fn, *a, warmup=2, iters=iters)
        except Exception as e:
            print(f"# {label} attempt {attempt}: {type(e).__name__} "
                  f"{str(e)[:120]}", flush=True)
            time.sleep(20)
    return None


gm = jax.jit(lambda t, i: t[i])

cases = {
    "u4.0M": rng.integers(0, N_ROWS, 4_000_000).astype(np.int32),
    "u2.1M": rng.integers(0, N_ROWS, 2_098_176).astype(np.int32),
    "u4.7M": rng.integers(0, N_ROWS, 4_718_592).astype(np.int32),
    "rest4.0M": r_src[:4_000_000],
    "rest4.0M_sorted": np.sort(r_src[:4_000_000]),
    "u4.0M_sorted": np.sort(rng.integers(0, N_ROWS, 4_000_000).astype(np.int32)),
}
for label, idx_h in cases.items():
    idx = jnp.asarray(idx_h)
    t = robust(label, gm, x, idx)
    t and print(f"{label:16s}: {t*1e3:7.1f} ms  {t/len(idx_h)*1e9:5.2f} ns/row",
                flush=True)
