import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from geot_tpu.utils.timing import timeit
rng = np.random.default_rng(0)
N = 128
full = jnp.asarray(rng.standard_normal((2_449_029, N)).astype(np.float32))
for n_rows in (170_000, 600_000, 1_200_000, 2_449_029):
    for n_idx in (2_000_000,):
        tbl = full[:n_rows]
        idx = jnp.asarray(rng.integers(0, n_rows, n_idx).astype(np.int32))
        g = jax.jit(lambda t, i: t[i])
        tm = timeit(g, tbl, idx, warmup=2, iters=8)
        print(f"rows={n_rows:8d} idx={n_idx}: {tm*1e3:6.2f} ms  ({tm/n_idx*1e9:.2f} ns/row)", flush=True)
# slice-then-gather: does gathering from a dynamic slice of the big table stay cheap?
off = 1_000_000
idx = jnp.asarray(rng.integers(0, 170_000, 2_000_000).astype(np.int32))
g2 = jax.jit(lambda t, i: jax.lax.dynamic_slice_in_dim(t, off, 170_000)[i])
tm = timeit(g2, full, idx, warmup=2, iters=8)
print(f"slice[1M:1.17M] then gather 2M: {tm*1e3:6.2f} ms", flush=True)
