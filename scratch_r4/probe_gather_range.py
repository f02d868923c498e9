"""Is the XLA row gather's per-row cost a function of the INDEX RANGE the
gather touches (page/TLB locality), not the table object size?  Round-2
measured 3.5 ns/row at 87 MB tables vs ~12 ns/row in context at the 1.25 GB
products table (non-monotonic in between).  If restricting the index range
recovers the small-table rate, the hybrid REST path can bucket residue
edges by src range and gather each bucket from a narrow window.

Fixed 4M uniform random indices; [2.45M, 128] f32 table (1.25 GB).
  full      — idx over all rows
  range10   — idx over the first 10% of rows (same table object)
  range3    — idx over the first 3%
  slice10   — gather from a materialized 10% slice copy (control)
  bf16 full — same as full from a bf16 table
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from geot_tpu.utils.timing import timeit

N_ROWS = 2_449_029
N_IDX = 4_000_000
F = 128
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((N_ROWS, F)).astype(np.float32))
xb = x.astype(jnp.bfloat16)


def robust(label, fn, *a, **k):
    for attempt in range(3):
        try:
            return timeit(fn, *a, **k)
        except Exception as e:
            print(f"# {label} attempt {attempt}: {type(e).__name__} "
                  f"{str(e)[:90]}", flush=True)
            time.sleep(30)
    return None


g = jax.jit(lambda t, i: jnp.sum(t[i], axis=0))  # sum to avoid 2 GB output

for frac, label in ((1.0, "full"), (0.10, "range10"), (0.03, "range3")):
    hi = max(int(N_ROWS * frac), 1)
    idx = jnp.asarray(rng.integers(0, hi, N_IDX).astype(np.int32))
    t = robust(label, g, x, idx, warmup=2, iters=10)
    t and print(f"{label:8s}: {t*1e3:7.2f} ms  {t/N_IDX*1e9:5.2f} ns/row",
                flush=True)

hi = int(N_ROWS * 0.10)
xs = x[:hi]
idx = jnp.asarray(rng.integers(0, hi, N_IDX).astype(np.int32))
t = robust("slice10", g, xs, idx, warmup=2, iters=10)
t and print(f"{'slice10':8s}: {t*1e3:7.2f} ms  {t/N_IDX*1e9:5.2f} ns/row",
            flush=True)

idx = jnp.asarray(rng.integers(0, N_ROWS, N_IDX).astype(np.int32))
gb = jax.jit(lambda t, i: jnp.sum(t[i].astype(jnp.float32), axis=0))
t = robust("bf16full", gb, xb, idx, warmup=2, iters=10)
t and print(f"{'bf16full':8s}: {t*1e3:7.2f} ms  {t/N_IDX*1e9:5.2f} ns/row",
            flush=True)

# materialization control: the real rest path MATERIALIZES the gathered
# block ([chunk, 128] write) rather than reducing it — time that shape too
gm = jax.jit(lambda t, i: t[i])
idx = jnp.asarray(rng.integers(0, N_ROWS, N_IDX).astype(np.int32))
t = robust("full_mat", gm, x, idx, warmup=2, iters=10)
t and print(f"{'full_mat':8s}: {t*1e3:7.2f} ms  {t/N_IDX*1e9:5.2f} ns/row",
            flush=True)
idx = jnp.asarray(rng.integers(0, max(int(N_ROWS*0.10),1), N_IDX).astype(np.int32))
t = robust("r10_mat", gm, x, idx, warmup=2, iters=10)
t and print(f"{'r10_mat':8s}: {t*1e3:7.2f} ms  {t/N_IDX*1e9:5.2f} ns/row",
            flush=True)
