import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from geot_tpu.utils.timing import timeit
from geot_tpu.graph.plan import build_bat_plan
from geot_tpu.ops import api as ops

rng = np.random.default_rng(0)
n_nodes = 2_449_029
nnz = 2_097_152  # one chunk's worth (2048 tiles x 1024)
N = 128
# products-like dst slice: sorted, covering ~1/30 of node range
dst = np.sort(rng.integers(0, n_nodes // 30, nnz)).astype(np.int32)
src = rng.integers(0, n_nodes, nnz).astype(np.int32)
w = rng.standard_normal(nnz).astype(np.float32)
x = jnp.asarray(rng.standard_normal((n_nodes, N)).astype(np.float32))
srcj = jnp.asarray(src)
bp = build_bat_plan(dst, n_nodes // 30 + 1, e_tile=1024, s_tile=256)
print("tiles:", bp.num_tiles, "chunks:", len(bp.chunks), flush=True)

g = jax.jit(lambda t, i: t[i])
t_g = timeit(g, x, srcj, warmup=2, iters=8)
print(f"gather only: {t_g*1e3:.2f} ms = {t_g/nnz*1e9:.2f} ns/row", flush=True)

vals = g(x, srcj)
from geot_tpu.ops.pallas_segment import bat_segment_sum
wj = jnp.asarray(w)
k = jax.jit(lambda v, ww: bat_segment_sum(bp, v, ww, f_tile=128))
t_k = timeit(k, vals, wj, warmup=2, iters=8)
print(f"kernel only: {t_k*1e3:.2f} ms = {t_k/nnz*1e9:.2f} ns/edge", flush=True)

f = jax.jit(lambda xx, ww: ops.index_scatter(xx[srcj]*0+xx[srcj], jnp.asarray(dst), n_nodes//30+1, plan=bp, backend="pallas"))
full = jax.jit(lambda xx, ww: ops.gather_weight_scatter(srcj, jnp.asarray(dst), ww, xx, n_nodes//30+1,
    graph=None, backend="pallas"))
# fused single-chunk via _spmm_fwd_bat directly
fs = jax.jit(lambda xx, ww: ops._spmm_fwd_bat(bp, xx, srcj, ww))
t_f = timeit(fs, x, wj, warmup=2, iters=8)
print(f"fused single-chunk: {t_f*1e3:.2f} ms = {t_f/nnz*1e9:.2f} ns/edge", flush=True)
