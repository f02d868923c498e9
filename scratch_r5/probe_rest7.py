"""Verify the exact gather sizes the repaired rest executor would use
(vblock-span chunks, multiples of E=1024) sit in the FAST region of the
XLA gather emitter (probe_rest6: ~2M+ rows fast at ~4.7-5.9 ns/row, but
2^21/2^22/3.5M/4.6M-ish sizes fall on an ~11 ns/row path)."""
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

# candidate (vspan+1)*1024 gather sizes, plus probes around the slow zones
for nblk in (1953, 2441, 2930, 3417, 3906, 4394, 4395, 4882, 5371, 5860):
    n = nblk * 1024
    idx = jnp.asarray(rng.integers(0, N_ROWS, n).astype(np.int32))
    t = robust(str(n), gm, x, idx)
    t and print(f"nblk={nblk:5d} n={n:9d}: {t*1e3:7.1f} ms  "
                f"{t/n*1e9:5.2f} ns/row", flush=True)
