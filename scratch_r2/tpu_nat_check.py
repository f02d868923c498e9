import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import geot_tpu
from geot_tpu.graph import build_graph
from geot_tpu.ops import reference as ref
rng = np.random.default_rng(3)
n, nnz, N = 5000, 60000, 128
dst = np.sort(rng.integers(0, n, nnz)).astype(np.int32)
src = rng.integers(0, n, nnz).astype(np.int32)
w = rng.standard_normal(nnz).astype(np.float32)
g = build_graph(src, dst, n, edge_weight=w, assume_sorted=True)
x = jnp.asarray(rng.standard_normal((n, N)).astype(np.float32))
out = jax.jit(lambda xx: geot_tpu.segment_spmm(g, xx, backend="pallas"))(x)
exp = ref.gather_weight_scatter_ref(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w), x, n)
err = float(jnp.max(jnp.abs(out - exp))) / (float(jnp.max(jnp.abs(exp))) + 1e-9)
print("rel err:", err); assert err < 1e-2
print("NATIVE-BAT TPU CHECK PASSED")
