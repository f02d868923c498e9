import numpy as np, jax, jax.numpy as jnp
from geot_tpu.graph.structures import build_graph
from geot_tpu.ops import api as ops
from geot_tpu.ops import reference as ref
rng = np.random.default_rng(91)
n = 220
dst = np.concatenate([np.full(600, 7, np.int32), rng.integers(0, n, 1100).astype(np.int32)])
src = rng.integers(0, n, len(dst)).astype(np.int32)
w_host = rng.standard_normal(len(dst)).astype(np.float32)
g = build_graph(src, dst, n, edge_weight=w_host, e_tile=64, s_tile=64, feature_hint=128)
x = jnp.asarray(rng.standard_normal((n, 128)).astype(np.float32))
out = ops.segment_spmm(g, x, backend="pallas")
gr = jax.grad(lambda xx: jnp.sum(ops.segment_spmm(g, xx, backend="pallas") ** 2))(x)
manual = ops._spmm_fwd_bat(g.bat_t, 2 * out, g.dst_t, g.edge_weight_t)
print("grad vs manual:", float(jnp.max(jnp.abs(gr - manual))), flush=True)
ge = jax.grad(lambda xx: jnp.sum(ref.gather_weight_scatter_ref(g.src, g.dst, g.edge_weight, xx, n) ** 2))(x)
print("manual vs ref-grad:", float(jnp.max(jnp.abs(manual - ge))), flush=True)
oute = ref.gather_weight_scatter_ref(g.src, g.dst, g.edge_weight, x, n)
manual2 = ops._spmm_fwd_bat(g.bat_t, 2 * oute, g.dst_t, g.edge_weight_t)
print("manual(oute) vs ref-grad:", float(jnp.max(jnp.abs(manual2 - ge))), flush=True)
