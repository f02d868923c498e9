"""Variance check: repeat the same N=128 gather measurement 6 times."""
import numpy as np, sys, time
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from geot_tpu.utils.timing import timeit

rng = np.random.default_rng(0)
NNZ = 1166243
x = jnp.asarray(rng.standard_normal((169343, 128)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, 169343, size=NNZ, dtype=np.int32))
f = jax.jit(lambda t, i: t[i])
for r in range(6):
    t = timeit(f, x, idx, warmup=2, iters=20)
    print(f"run {r}: {t*1e3:.3f} ms", flush=True)
    time.sleep(2)
# sequential read+write reference
big = jnp.asarray(rng.standard_normal((NNZ, 128)).astype(np.float32))
g = jax.jit(lambda b: b * 2.0)
for r in range(3):
    t = timeit(g, big, warmup=2, iters=20)
    print(f"seq rw: {t*1e3:.3f} ms ({2*NNZ*128*4/1e9/t:.0f} GB/s)", flush=True)
