import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import geot_tpu
from geot_tpu.graph import build_graph
from geot_tpu.models import GCN, prepare_graph, train_node_classifier
from geot_tpu.graph.datasets import synthetic_classification_graph

print("backend:", jax.default_backend(), jax.devices()[0].device_kind)
rng = np.random.default_rng(0)
n, e, F = 500, 3000, 64
src = rng.integers(0, n, e).astype(np.int32)
dst = np.sort(rng.integers(0, n, e).astype(np.int32))
w = rng.standard_normal(e).astype(np.float32)
x = rng.standard_normal((n, F)).astype(np.float32)
g = build_graph(src, dst, n, edge_weight=w, assume_sorted=True)

out = jax.jit(lambda xx: geot_tpu.segment_spmm(g, xx))(jnp.asarray(x))
adj = np.zeros((n, n), np.float64); np.add.at(adj, (dst, src), w)
ref = adj @ x
np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-3)
print("fwd spmm vs dense oracle: OK")

# determinism
out2 = jax.jit(lambda xx: geot_tpu.segment_spmm(g, xx))(jnp.asarray(x))
assert np.array_equal(np.asarray(out), np.asarray(out2)); print("bit-deterministic: OK")

# grad through gather_weight_scatter
co = rng.standard_normal((n, F)).astype(np.float32)
def f(xx, ww):
    return jnp.vdot(geot_tpu.gather_weight_scatter(g.src, g.dst, ww, xx, n, graph=g), co)
gx, gw = jax.jit(jax.grad(f, argnums=(0,1)))(jnp.asarray(x), jnp.asarray(w))
gx_ref = adj.T @ co
gw_ref = (co[dst] * x[src]).sum(1)
np.testing.assert_allclose(np.asarray(gx), gx_ref, rtol=1e-3, atol=1e-3)
np.testing.assert_allclose(np.asarray(gw), gw_ref, rtol=1e-3, atol=1e-3)
print("grad (transpose plan + sddmm): OK")

# model training on TPU
d = synthetic_classification_graph(400, 2400, 4, seed=1)
gg = prepare_graph(d.src, d.dst, 400, add_self_loops=True)
model = GCN(hidden_features=32, num_layers=2, out_features=4)
params, metrics = train_node_classifier(model, gg, jnp.asarray(d.x), jnp.asarray(d.y),
    jnp.asarray(d.train_mask), jnp.asarray(d.val_mask), epochs=60, lr=0.02)
print("GCN train on TPU:", metrics)
assert metrics["train_acc"] > 0.85, metrics
print("ALL DRIVE CHECKS PASSED")

# fused GAT path on TPU
from geot_tpu.ops import api as _api
xh = jnp.asarray(rng.standard_normal((400, 4, 32)).astype(np.float32))
a_s = jnp.asarray(0.3*rng.standard_normal((400, 4)).astype(np.float32))
a_d = jnp.asarray(0.3*rng.standard_normal((400, 4)).astype(np.float32))
out_gat = jax.jit(lambda *a: _api.gat_attention_spmm(gg, *a))(xh, a_s, a_d)
assert np.isfinite(np.asarray(out_gat)).all()
print("fused GAT attention on TPU: OK")

# streaming hybrid path on a clustered graph (round-3 gather-free SpMM)
from geot_tpu.graph.datasets import synthetic_clustered_graph
# feature_hint must be a wide (non-packed) width: packed narrow-N
# layouts (n<=64) skip the stream plan by design (structures.py nw gate)
dc = synthetic_clustered_graph(4000, 120_000, mixing=0.2, mean_community=400, seed=2)
wc = rng.standard_normal(dc.num_edges).astype(np.float32)
gc = build_graph(dc.src, dc.dst, 4000, edge_weight=wc, feature_hint=128)
assert gc.hyb is not None, "clustered graph should take the stream split"
xc = rng.standard_normal((4000, 128)).astype(np.float32)
out_h = jax.jit(lambda xx: geot_tpu.segment_spmm(gc, xx))(jnp.asarray(xc))
adj_c = np.zeros((4000, 4000), np.float64)
np.add.at(adj_c, (np.asarray(gc.dst), np.asarray(gc.src)), np.asarray(gc.edge_weight))
np.testing.assert_allclose(np.asarray(out_h), adj_c @ xc, rtol=2e-3, atol=2e-3)
print("streaming hybrid SpMM vs dense oracle: OK")
