"""R2 probe 1: XLA gather bandwidth variants + dynamic roll support on TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp
import sys

sys.path.insert(0, "/root/repo")
from geot_tpu.utils.timing import timeit

NODES, NNZ, N = 169343, 1166243, 128
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((NODES, N)).astype(np.float32))
src = rng.integers(0, NODES, size=NNZ, dtype=np.int32)

def bw(name, idx, tab, n=N, dtype_bytes=4):
    idxj = jnp.asarray(idx)
    f = jax.jit(lambda t, i: t[i])
    t = timeit(f, tab, idxj, warmup=3, iters=20)
    gb = len(idx) * n * dtype_bytes / 1e9
    print(f"{name:40s} {t*1e3:8.3f} ms  {gb/t:8.1f} GB/s")
    return t

print("device:", jax.devices()[0].device_kind, jax.default_backend())

# 1. random gather (current baseline)
bw("random src [169k,128] f32", src, x)
# 2. fully sorted indices
bw("fully-sorted src", np.sort(src), x)
# 3. window-sorted: sort within consecutive runs of 1792 (approx window size)
ws = src.copy()
W = 1792
for i in range(0, NNZ, W):
    ws[i:i+W] = np.sort(ws[i:i+W])
bw("window-sorted (runs of 1792)", ws, x)
# 4. small table gather: same nnz, table 8192 rows
small = jnp.asarray(rng.standard_normal((8192, N)).astype(np.float32))
src_small = rng.integers(0, 8192, size=NNZ, dtype=np.int32)
bw("random from [8192,128] table", src_small, small)
# 5. N=100 rows (products row size)
x100 = jnp.asarray(rng.standard_normal((NODES, 100)).astype(np.float32))
bw("random src [169k,100] f32", src, x100, n=100)
# 6. bf16 table N=128
xb = x.astype(jnp.bfloat16)
bw("random src [169k,128] bf16", src, xb, dtype_bytes=2)
# 7. gather fused with weight multiply (does it stay one pass?)
w = jnp.asarray(rng.standard_normal(NNZ).astype(np.float32))
f2 = jax.jit(lambda t, i, w: t[i] * w[:, None])
t = timeit(f2, x, jnp.asarray(src), w, warmup=3, iters=20)
print(f"{'gather*weight fused':40s} {t*1e3:8.3f} ms")
# 8. nnz scalar gather (the dynamic-weight permutation cost)
perm = rng.permutation(NNZ).astype(np.int32)
f3 = jax.jit(lambda w, p: w[p])
t = timeit(f3, w, jnp.asarray(perm), warmup=3, iters=20)
print(f"{'nnz scalar permutation w[perm]':40s} {t*1e3:8.3f} ms")
