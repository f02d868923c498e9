"""Model-layer tests: per-layer numerics vs dense references + training.

Mirrors the reference test strategy (SURVEY §4): conv outputs compared
allclose against hand-computed dense-adjacency math (the role PyG eager
plays in `test/compile/test_gcn.py:23-29`), plus what the reference lacks —
gradient checks and an actual training-convergence test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geot_tpu.graph.datasets import synthetic_classification_graph
from geot_tpu.models import (
    GAT,
    GCN,
    GIN,
    MODELS,
    APPNPConv,
    GATConv,
    GCNConv,
    GINConv,
    GraphSAGE,
    SAGEConv,
    SGConv,
    prepare_graph,
    train_node_classifier,
)
from geot_tpu.models.train import load_checkpoint, save_checkpoint


def _rand_graph(rng, n=60, e=300, self_loops=False):
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    g = prepare_graph(src, dst, n, add_self_loops=self_loops, e_tile=128, s_tile=128)
    return g, src, dst


def _dense_adj(g, n, weight=None):
    a = np.zeros((n, n), np.float64)
    src = np.asarray(g.src)
    dst = np.asarray(g.dst)
    w = np.ones(len(src)) if weight is None else np.asarray(weight, np.float64)
    np.add.at(a, (dst, src), w)
    return a


def test_gcnconv_matches_dense():
    rng = np.random.default_rng(0)
    g, _, _ = _rand_graph(rng, self_loops=True)
    n = g.num_nodes
    x = jnp.asarray(rng.standard_normal((n, 16), dtype=np.float32))
    conv = GCNConv(features=8)
    params = conv.init(jax.random.PRNGKey(0), x, g)
    out = conv.apply(params, x, g)

    a = _dense_adj(g, n)
    deg = a.sum(axis=1)
    dinv = np.where(deg > 0, deg**-0.5, 0.0)
    a_norm = dinv[:, None] * a * dinv[None, :]
    kernel = np.asarray(params["params"]["Dense_0"]["kernel"], np.float64)
    bias = np.asarray(params["params"]["bias"], np.float64)
    ref = a_norm @ (np.asarray(x, np.float64) @ kernel) + bias
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_sageconv_matches_dense():
    rng = np.random.default_rng(1)
    g, _, _ = _rand_graph(rng)
    n = g.num_nodes
    x = jnp.asarray(rng.standard_normal((n, 12), dtype=np.float32))
    conv = SAGEConv(features=8)
    params = conv.init(jax.random.PRNGKey(0), x, g)
    out = conv.apply(params, x, g)

    a = _dense_adj(g, n)
    deg = np.maximum(a.sum(axis=1), 1.0)
    mean_agg = (a @ np.asarray(x, np.float64)) / deg[:, None]
    p = params["params"]
    ref = (
        mean_agg @ np.asarray(p["Dense_0"]["kernel"], np.float64)
        + np.asarray(p["Dense_0"]["bias"], np.float64)
        + np.asarray(x, np.float64) @ np.asarray(p["Dense_1"]["kernel"], np.float64)
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_ginconv_matches_dense():
    rng = np.random.default_rng(2)
    g, _, _ = _rand_graph(rng)
    n = g.num_nodes
    x = jnp.asarray(rng.standard_normal((n, 12), dtype=np.float32))
    conv = GINConv(features=8, eps=0.3)
    params = conv.init(jax.random.PRNGKey(0), x, g)
    out = conv.apply(params, x, g)

    a = _dense_adj(g, n)
    h = 1.3 * np.asarray(x, np.float64) + a @ np.asarray(x, np.float64)
    p = params["params"]["MLP_0"]
    h = h @ np.asarray(p["Dense_0"]["kernel"], np.float64) + np.asarray(
        p["Dense_0"]["bias"], np.float64
    )
    h = np.maximum(h, 0)
    ref = h @ np.asarray(p["Dense_1"]["kernel"], np.float64) + np.asarray(
        p["Dense_1"]["bias"], np.float64
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_gatconv_rowstochastic_and_shape():
    """Attention weights must softmax to 1 per destination; output of a
    single head with uniform attention equals the mean aggregate."""
    rng = np.random.default_rng(3)
    g, _, _ = _rand_graph(rng, self_loops=True)
    n = g.num_nodes
    x = jnp.asarray(rng.standard_normal((n, 10), dtype=np.float32))
    conv = GATConv(features=6, heads=4)
    params = conv.init(jax.random.PRNGKey(1), x, g)
    out = conv.apply(params, x, g)
    assert out.shape == (n, 24)
    assert np.isfinite(np.asarray(out)).all()
    # zero attention params → uniform attention → mean aggregation
    p0 = jax.tree_util.tree_map(lambda a: a, params)
    p0["params"]["att_src"] = jnp.zeros_like(p0["params"]["att_src"])
    p0["params"]["att_dst"] = jnp.zeros_like(p0["params"]["att_dst"])
    out_u = conv.apply(p0, x, g)
    a = _dense_adj(g, n)
    deg = np.maximum(a.sum(axis=1), 1.0)
    xh = np.asarray(x, np.float64) @ np.asarray(
        params["params"]["Dense_0"]["kernel"], np.float64
    )
    xh = xh.reshape(n, 4, 6)
    ref = np.einsum("ij,jhd->ihd", a, xh) / deg[:, None, None]
    ref = ref.reshape(n, 24) + np.asarray(params["params"]["bias"], np.float64)
    np.testing.assert_allclose(np.asarray(out_u), ref, rtol=1e-4, atol=1e-4)


def test_sgc_appnp_run():
    rng = np.random.default_rng(4)
    g, _, _ = _rand_graph(rng, self_loops=True)
    x = jnp.asarray(rng.standard_normal((g.num_nodes, 10), dtype=np.float32))
    out = SGConv(features=5, k=2).init_with_output(jax.random.PRNGKey(0), x, g)[0]
    assert out.shape == (g.num_nodes, 5)
    out = APPNPConv(k=3, alpha=0.2).init_with_output(jax.random.PRNGKey(0), x, g)[0]
    assert out.shape == (g.num_nodes, 10)


@pytest.mark.parametrize("name", sorted(MODELS))
def test_model_families_forward_and_grad(name):
    model_cls, needs_loops = MODELS[name]
    rng = np.random.default_rng(5)
    g, _, _ = _rand_graph(rng, self_loops=needs_loops)
    x = jnp.asarray(rng.standard_normal((g.num_nodes, 8), dtype=np.float32))
    model = model_cls(hidden_features=16, num_layers=2, out_features=4)
    params = model.init(jax.random.PRNGKey(0), x, g)
    logits = model.apply(params, x, g)
    assert logits.shape == (g.num_nodes, 4)
    assert np.isfinite(np.asarray(logits)).all()

    def loss(p):
        return jnp.sum(model.apply(p, x, g) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_gcn_trains_on_separable_graph(tmp_path):
    """End-to-end training sanity (BASELINE config #1 shape): features carry
    the label signal, so a 2-layer GCN must reach high train accuracy."""
    d = synthetic_classification_graph(200, 1200, 4, seed=6, feature_noise=0.4)
    x, y = d.x, d.y
    g = prepare_graph(d.src, d.dst, 200, add_self_loops=True, e_tile=128, s_tile=128)
    model = GCN(hidden_features=16, num_layers=2, out_features=4)
    ckpt = str(tmp_path / "gcn_ckpt.npz")
    params, metrics = train_node_classifier(
        model,
        g,
        jnp.asarray(x),
        jnp.asarray(y),
        jnp.asarray(d.train_mask),
        jnp.asarray(d.val_mask),
        epochs=120,
        lr=0.02,
        checkpoint_path=ckpt,
    )
    assert metrics["train_acc"] > 0.9, metrics
    assert metrics["val_acc"] > 0.75, metrics
    # checkpoint round-trip
    restored, meta = load_checkpoint(ckpt)
    out_a = model.apply(params, jnp.asarray(x), g)
    out_b = model.apply(restored, jnp.asarray(x), g)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), rtol=1e-6)
    assert meta["train_acc"] == metrics["train_acc"]


def test_gcnconv_baked_norm_matches_dynamic():
    """prepare_graph(normalize='gcn') cached-slot path ≡ per-forward norm,
    forward and gradient."""
    rng = np.random.default_rng(8)
    n, e = 60, 300
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    x = jnp.asarray(rng.standard_normal((n, 12), dtype=np.float32))
    g_dyn = prepare_graph(src, dst, n, add_self_loops=True, e_tile=128, s_tile=128)
    g_bak = prepare_graph(
        src, dst, n, add_self_loops=True, normalize="gcn", e_tile=128, s_tile=128
    )
    conv = GCNConv(features=8)
    params = conv.init(jax.random.PRNGKey(0), x, g_dyn)
    out_dyn = conv.apply(params, x, g_dyn)
    out_bak = conv.apply(params, x, g_bak)
    np.testing.assert_allclose(
        np.asarray(out_dyn), np.asarray(out_bak), rtol=1e-5, atol=1e-5
    )
    gd = jax.grad(lambda xx: jnp.sum(conv.apply(params, xx, g_dyn) ** 2))(x)
    gb = jax.grad(lambda xx: jnp.sum(conv.apply(params, xx, g_bak) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gb), rtol=1e-4, atol=1e-4)


def test_pallas_vs_reference_backend_model_parity():
    """The same params must produce (near-)identical activations through the
    Pallas plan path and the XLA reference path — the analogue of the
    reference comparing GeoT vs PyG outputs (`test/compile/test_gcn.py`)."""
    rng = np.random.default_rng(7)
    g, _, _ = _rand_graph(rng, self_loops=True)
    x = jnp.asarray(rng.standard_normal((g.num_nodes, 32), dtype=np.float32))
    m_ref = GCN(hidden_features=16, num_layers=2, out_features=4, backend="reference")
    m_pal = GCN(hidden_features=16, num_layers=2, out_features=4, backend="pallas")
    params = m_ref.init(jax.random.PRNGKey(0), x, g)
    out_ref = m_ref.apply(params, x, g)
    out_pal = m_pal.apply(params, x, g)
    np.testing.assert_allclose(
        np.asarray(out_ref), np.asarray(out_pal), rtol=1e-4, atol=1e-5
    )


def test_gcn_bf16_compute():
    """bf16 compute dtype: outputs finite, close to f32 within bf16 tol."""
    rng = np.random.default_rng(9)
    g, _, _ = _rand_graph(rng, self_loops=True)
    x = jnp.asarray(rng.standard_normal((g.num_nodes, 32), dtype=np.float32))
    m32 = GCN(hidden_features=16, num_layers=2, out_features=4)
    mbf = GCN(hidden_features=16, num_layers=2, out_features=4,
              dtype=jnp.bfloat16)
    params = m32.init(jax.random.PRNGKey(0), x, g)
    o32 = m32.apply(params, x, g)
    obf = mbf.apply(params, x, g)
    assert obf.dtype == jnp.bfloat16
    scale = float(jnp.max(jnp.abs(o32))) + 1e-6
    assert float(jnp.max(jnp.abs(obf.astype(jnp.float32) - o32))) < 0.1 * scale


def test_gcn_bf16_trains_to_f32_accuracy():
    """bf16 compute dtype (f32 master params) reaches the same train/val
    accuracy as f32 on the separable synthetic graph — the end-to-end half
    of the bf16 story (the kernel half: bf16 measured 1.25x faster at
    arxiv N=128, RESULTS r2)."""
    d = synthetic_classification_graph(200, 1200, 4, seed=6, feature_noise=0.4)
    g = prepare_graph(d.src, d.dst, 200, add_self_loops=True, e_tile=128,
                      s_tile=128)
    accs = {}
    for key, dt in (("f32", None), ("bf16", jnp.bfloat16)):
        model = GCN(hidden_features=16, num_layers=2, out_features=4, dtype=dt)
        _, metrics = train_node_classifier(
            model, g, jnp.asarray(d.x), jnp.asarray(d.y),
            jnp.asarray(d.train_mask), jnp.asarray(d.val_mask),
            epochs=120, lr=0.02,
        )
        accs[key] = metrics
    assert accs["bf16"]["train_acc"] > 0.9, accs
    assert abs(accs["bf16"]["train_acc"] - accs["f32"]["train_acc"]) < 0.06, accs
    assert abs(accs["bf16"]["val_acc"] - accs["f32"]["val_acc"]) < 0.1, accs
