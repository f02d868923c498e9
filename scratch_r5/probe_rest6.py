"""Map the materialized-gather rate vs index count (probe_rest5: 4.0M
indices -> 4.9 ns/row, but 2.1M and 4.7M -> ~11; the XLA gather emitter
has fast and slow shapes). Find the fast region / divisibility rule, then
verify the fast size survives lax.scan chunking.
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

counts = [
    1_000_000,
    2_000_000,
    2_097_152,      # 2^21
    2_098_176,      # 2049*1024 (the production chunk) — known slow
    2_500_000,
    3_000_000,
    3_500_000,
    4_000_000,      # known fast
    4_194_304,      # 2^22
    4_500_000,
    4_718_592,      # known slow
    5_000_000,
    6_000_000,
    8_000_000,
]
for n in counts:
    idx = jnp.asarray(rng.integers(0, N_ROWS, n).astype(np.int32))
    t = robust(str(n), gm, x, idx, iters=8)
    t and print(f"n={n:9d}: {t*1e3:7.1f} ms  {t/n*1e9:5.2f} ns/row",
                flush=True)

# fast size in scan context: 5 chunks of 4.0M (20M total)
C = 4_000_000
n_c = 5
idx = jnp.asarray(rng.integers(0, N_ROWS, n_c * C).astype(np.int32))


def scan_fast(x, idx):
    def body(acc, c):
        sl = jax.lax.dynamic_slice_in_dim(idx, c * C, C)
        v = jax.lax.optimization_barrier(x[sl])
        return acc + jnp.sum(v, axis=0), None

    acc, _ = jax.lax.scan(
        body, jnp.zeros((F,), jnp.float32), jnp.arange(n_c, dtype=jnp.int32)
    )
    return acc


t = robust("scan5x4M", jax.jit(scan_fast), x, idx, iters=6)
t and print(f"scan5x4M: {t*1e3:7.1f} ms  {t/(n_c*C)*1e9:5.2f} ns/row",
            flush=True)
