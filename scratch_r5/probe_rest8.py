"""The XLA gather emitter's slow path triggers when the index count is
divisible by 1024 (rest7: every nblk*1024 slow; rest6: 2.0/2.5/3.0/4.0/5/6M
fast). The kernel needs gathers of nblk*e_tile rows. Escape hatches:

  A. v2=9 sizes: odd*512 (e_tile=512, odd block count per chunk)
  B. v2=10 exactly vs >10 distinction? (odd*1024)
  C. 2D-index gather: x[idx.reshape(-1, 1024)] then reshape back
  D. gather at fast size + jnp.pad to the block multiple (copy cost)
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


gm = jax.jit(lambda t, i: t[i])

# A: odd*512 (v2=9); B: odd*1024 (v2=10); odd*2048 (v2=11)
for label, n in (
    ("7813*512 v2=9", 7813 * 512),
    ("3907*1024 v2=10", 3907 * 1024),
    ("1953*2048 v2=11", 1953 * 2048),
    ("3905*512 v2=9", 3905 * 512),
    ("7811*512 v2=9", 7811 * 512),
):
    idx = jnp.asarray(rng.integers(0, N_ROWS, n).astype(np.int32))
    t = robust(label, gm, x, idx)
    t and print(f"{label:18s} n={n:9d}: {t*1e3:7.1f} ms  {t/n*1e9:5.2f} ns/row",
                flush=True)

# C: 2D-index gather at a multiple-of-1024 count
n = 3906 * 1024
idx = jnp.asarray(rng.integers(0, N_ROWS, n).astype(np.int32))
g2d = jax.jit(lambda t, i: t[i.reshape(-1, 1024)].reshape(-1, F))
t = robust("2d_gather", g2d, x, idx)
t and print(f"{'2d_gather':18s} n={n:9d}: {t*1e3:7.1f} ms  {t/n*1e9:5.2f} ns/row",
            flush=True)
g2db = jax.jit(lambda t, i: t[i.reshape(1024, -1)].reshape(-1, F))
t = robust("2d_gather_b", g2db, x, idx)
t and print(f"{'2d_gather_b':18s} n={n:9d}: {t*1e3:7.1f} ms  {t/n*1e9:5.2f} ns/row",
            flush=True)

# D: fast-size gather + pad to the block multiple
n_fast = 4_000_000
n_tgt = 3907 * 1024  # 4,000,768
idx = jnp.asarray(rng.integers(0, N_ROWS, n_fast).astype(np.int32))
gp = jax.jit(
    lambda t, i: jnp.pad(t[i], ((0, n_tgt - n_fast), (0, 0)))
)
t = robust("gather+pad", gp, x, idx)
t and print(f"{'gather+pad':18s} n={n_fast:9d}: {t*1e3:7.1f} ms  "
            f"{t/n_fast*1e9:5.2f} ns/row", flush=True)
