import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from geot_tpu.graph.plan import build_bat_plan
from geot_tpu.ops import api as ops
from geot_tpu.graph.structures import build_graph

rng = np.random.default_rng(5)
n, nnz, N = 3000, 40000, 128
dst = np.sort(rng.integers(0, n, nnz)).astype(np.int32)
src = rng.integers(0, n, nnz).astype(np.int32)
w = rng.standard_normal(nnz).astype(np.float32)
x = jnp.asarray(rng.standard_normal((n, N)).astype(np.float32))

bp = build_bat_plan(dst, n, e_tile=256, s_tile=256, max_chunk_tiles=16)
print("chunks:", len(bp.chunks))
vals = jnp.asarray(rng.standard_normal((nnz, N)).astype(np.float32))
out = jax.jit(lambda v: ops.index_scatter(v, jnp.asarray(dst), n, plan=bp, backend="pallas"))(vals)
exp = ops.index_scatter(vals, jnp.asarray(dst), n, backend="reference")
err = float(jnp.max(jnp.abs(out - exp)))
print("iscat scan err:", err); assert err < 2e-2

g = build_graph(src, dst, n, edge_weight=w, assume_sorted=True)
import dataclasses
bp2 = build_bat_plan(dst, n, e_tile=1024, s_tile=256, max_chunk_tiles=8)
g2 = dataclasses.replace(g, bat=bp2)
print("g2 chunks:", len(bp2.chunks))
out2 = jax.jit(lambda gg, xx, ww: ops.gather_weight_scatter(gg.src, gg.dst, ww, xx, n, graph=gg, backend="pallas"))(g2, x, jnp.asarray(w))
from geot_tpu.ops import reference as ref
exp2 = ref.gather_weight_scatter_ref(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w), x, n)
err2 = float(jnp.max(jnp.abs(out2 - exp2)))
print("gws scan err:", err2); assert err2 < 2e-2 * float(jnp.max(jnp.abs(exp2)))
print("TPU SCAN CHECKS PASSED")
