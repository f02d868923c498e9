"""Where does the in-scan gather's 2.3x overhead come from (probe_rest2:
gather_big 4.81 ns/row vs gather_scan 11.02)?  Separate per-call fixed cost
from scan-context cost, and find the chunk size that amortizes it.

  g_std_2M   — standalone top-level gather of one chunk's rows (2.1M)
  g_std_4.7M — standalone gather of 4.7M rows
  unroll14   — ONE jit: 14 sequential 2.1M gathers (dynamic offsets), summed
  unroll4    — ONE jit: 4 sequential 4.7M gathers, summed
  scan4      — lax.scan over 4 chunks of 4.7M (vs probe_rest2's scan14)
  scan14_arg — scan over 14 chunks with idx chunks PRECOMPUTED as a [14, C]
               array argument (no pad+dynamic_slice in the body)
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
NRE = 18_656_895
idx_h = rng.integers(0, N_ROWS, NRE).astype(np.int32)

C14 = 2_098_176
C4 = 4_718_592  # 4.5M*... pick multiple of 1024*4608; any static size works


def report(label, t, rows):
    print(f"{label}: {t*1e3:7.1f} ms  {t/rows*1e9:5.2f} ns/row", flush=True)


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


# standalone single-chunk gathers
for label, n in (("g_std_2M", C14), ("g_std_4.7M", C4)):
    idx = jnp.asarray(idx_h[:n])
    t = robust(label, jax.jit(lambda x, i: x[i]), x, idx)
    t and report(label, t, n)

# unrolled multi-gather inside ONE jit
for label, n_chunks, csize in (("unroll14", 14, C14), ("unroll4", 4, C4)):
    pad = n_chunks * csize - NRE
    idx = jnp.asarray(np.pad(idx_h, (0, pad)))

    def unrolled(x, idx):
        acc = jnp.zeros((F,), jnp.float32)
        for c in range(n_chunks):
            sl = jax.lax.dynamic_slice_in_dim(idx, c * csize, csize)
            acc = acc + jnp.sum(x[sl], axis=0)
        return acc

    t = robust(label, jax.jit(unrolled), x, idx)
    t and report(label, t, n_chunks * csize)

# scan with 4 big chunks
pad = 4 * C4 - NRE
idx = jnp.asarray(np.pad(idx_h, (0, pad)))


def scan4(x, idx):
    def body(acc, c):
        sl = jax.lax.dynamic_slice_in_dim(idx, c * C4, C4)
        return acc + jnp.sum(x[sl], axis=0), None

    acc, _ = jax.lax.scan(
        body, jnp.zeros((F,), jnp.float32), jnp.arange(4, dtype=jnp.int32)
    )
    return acc


t = robust("scan4", jax.jit(scan4), x, idx)
t and report("scan4", t, 4 * C4)

# scan14 with idx as a [14, C14] scanned argument (no slicing in body)
pad = 14 * C14 - NRE
idx2 = jnp.asarray(np.pad(idx_h, (0, pad)).reshape(14, C14))


def scan14_arg(x, idx2):
    def body(acc, sl):
        return acc + jnp.sum(x[sl], axis=0), None

    acc, _ = jax.lax.scan(body, jnp.zeros((F,), jnp.float32), idx2)
    return acc


t = robust("scan14_arg", jax.jit(scan14_arg), x, idx2)
t and report("scan14_arg", t, 14 * C14)
