"""Products-scale probes: gather rate vs table size/order, chunk-size sweep,
bf16 variant. Run AFTER the tuning sweep releases the TPU."""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from geot_tpu.utils.timing import timeit

rng = np.random.default_rng(0)
N = 128

def probe_gather(n_rows, n_idx, dtype, tag, sort=False):
    tbl = jnp.asarray(rng.standard_normal((n_rows, N)).astype(np.float32)).astype(dtype)
    idx_h = rng.integers(0, n_rows, n_idx).astype(np.int32)
    if sort:
        idx_h = np.sort(idx_h)
    idx = jnp.asarray(idx_h)
    f = jax.jit(lambda t, i: t[i].sum(axis=0))  # sum avoids materializing [n_idx,N] output write dominance? no—gather still materializes? XLA may fuse into reduce. Use full materialize instead:
    g = jax.jit(lambda t, i: t[i])
    tm = timeit(g, tbl, idx, warmup=2, iters=8)
    print(f"gather {tag}: rows={n_rows} idx={n_idx} {dtype.__name__ if hasattr(dtype,'__name__') else dtype} sort={sort}: {tm*1e3:.1f} ms = {tm/n_idx*1e9:.2f} ns/row", flush=True)
    return tm

# 1. gather rate: arxiv-size vs products-size table (f32, random idx)
probe_gather(170_000, 10_000_000, jnp.float32, "small-table")
probe_gather(2_449_029, 10_000_000, jnp.float32, "big-table")
probe_gather(2_449_029, 10_000_000, jnp.float32, "big-table-sorted", sort=True)
probe_gather(2_449_029, 10_000_000, jnp.bfloat16, "big-table-bf16")
