"""Compiler-pass tests: jaxpr pattern rewrite vs eager evaluation.

Mirrors the reference compile tests (`test/compile/test_gcn.py:23-49`):
run the plain user function as control, transform, compare outputs, and
check the pattern actually matched (the reference prints the rewritten FX
graph; here `count_matches` reports fused sites).
"""

import jax
import jax.numpy as jnp
import numpy as np

from geot_tpu.compiler import count_matches, pattern_transform
from geot_tpu.models import prepare_graph


def _graph(seed=0, n=80, e=400):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    g = prepare_graph(src, dst, n, add_self_loops=False, e_tile=64, s_tile=64)
    return g, rng


def test_rewrites_weighted_scatter():
    g, rng = _graph(0)
    n = g.num_nodes
    x = jnp.asarray(rng.standard_normal((n, 16), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal(g.num_edges).astype(np.float32))
    src, dst = g.src, g.dst

    def user_fn(x, w):
        msg = x[src] * w[:, None]
        return jnp.zeros((n, x.shape[1]), x.dtype).at[dst].add(msg)

    assert count_matches(user_fn, g, x, w) == 1
    out = pattern_transform(user_fn, g, backend="pallas")(x, w)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(user_fn(x, w)), rtol=1e-4, atol=1e-4
    )


def test_nonzero_scatter_base_preserved():
    """`x.at[dst].add(x[src])` (residual/self-connection idiom): the fused
    op must add the scatter's base operand back, not drop it."""
    g, rng = _graph(7)
    n = g.num_nodes
    x = jnp.asarray(rng.standard_normal((n, 16), dtype=np.float32))
    src, dst = g.src, g.dst

    def user_fn(x):
        return x.at[dst].add(x[src])

    assert count_matches(user_fn, g, x) == 1
    out = pattern_transform(user_fn, g, backend="pallas")(x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(user_fn(x)), rtol=1e-4, atol=1e-4
    )


def test_rewrites_unweighted_segment_sum():
    g, rng = _graph(1)
    n = g.num_nodes
    x = jnp.asarray(rng.standard_normal((n, 8), dtype=np.float32))
    src, dst = g.src, g.dst

    def user_fn(x):
        return jax.ops.segment_sum(x[src], dst, n, indices_are_sorted=True)

    assert count_matches(user_fn, g, x) == 1
    out = pattern_transform(user_fn, g, backend="pallas")(x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(user_fn(x)), rtol=1e-4, atol=1e-4
    )


def test_rewrites_multihead():
    g, rng = _graph(2)
    n = g.num_nodes
    H, D = 4, 8
    x = jnp.asarray(rng.standard_normal((n, H, D), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((g.num_edges, H)).astype(np.float32))
    src, dst = g.src, g.dst

    def user_fn(x, w):
        msg = x[src] * w[:, :, None]
        return jnp.zeros((n, H, D), x.dtype).at[dst].add(msg)

    assert count_matches(user_fn, g, x, w) == 1
    out = pattern_transform(user_fn, g, backend="pallas")(x, w)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(user_fn(x, w)), rtol=1e-4, atol=1e-4
    )


def test_two_layer_model_and_jit():
    """Multi-layer user model: every layer's aggregation is rewritten; the
    wrapped fn works under jit (the reference's torch.compile step)."""
    g, rng = _graph(3)
    n = g.num_nodes
    src, dst = g.src, g.dst
    w1 = jnp.asarray(rng.standard_normal((16, 32), dtype=np.float32)) * 0.1
    w2 = jnp.asarray(rng.standard_normal((32, 4), dtype=np.float32)) * 0.1
    x = jnp.asarray(rng.standard_normal((n, 16), dtype=np.float32))

    def model(x):
        h = x @ w1
        h = jax.ops.segment_sum(h[src], dst, n, indices_are_sorted=True)
        h = jax.nn.relu(h)
        h = h @ w2
        return jax.ops.segment_sum(h[src], dst, n, indices_are_sorted=True)

    assert count_matches(model, g, x) == 2
    out = jax.jit(pattern_transform(model, g, backend="pallas"))(x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(model(x)), rtol=1e-4, atol=1e-4
    )


def test_no_match_left_untouched():
    """Shape-mismatched scatters must evaluate unchanged."""
    g, rng = _graph(4)
    x = jnp.asarray(rng.standard_normal((50, 8), dtype=np.float32))
    idx = jnp.asarray(rng.integers(0, 50, 50).astype(np.int32))

    def user_fn(x):
        return jnp.zeros((50, 8), x.dtype).at[idx].add(x)

    assert count_matches(user_fn, g, x) == 0
    out = pattern_transform(user_fn, g)(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(user_fn(x)), rtol=1e-6)
