"""Distributed GCN training step vs single-device reference.

Covers what the reference cannot (single-GPU only): the full multi-chip
train step — halo-exchange SpMM forward, psum'd gradients, optimizer
update — must track a single-device implementation exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh

from geot_tpu.graph.datasets import synthetic_classification_graph
from geot_tpu.models.conv import gcn_edge_weight, prepare_graph
from geot_tpu.ops import reference as ref
from geot_tpu.parallel import partition_graph
from geot_tpu.parallel.dist_train import (
    gcn_forward,
    init_gcn_params,
    make_dist_train_step,
    shard_inputs,
)


def _setup(nparts, seed=0):
    devs = jax.devices()
    if len(devs) < nparts:
        pytest.skip(f"needs {nparts} devices")
    mesh = Mesh(np.array(devs[:nparts]), ("parts",))
    d = synthetic_classification_graph(96, 600, 4, feat_dim=8, seed=seed)
    g = prepare_graph(d.src, d.dst, d.num_nodes, add_self_loops=True,
                      e_tile=32, s_tile=32)
    w = np.asarray(gcn_edge_weight(g))
    pg = partition_graph(
        np.asarray(g.src), np.asarray(g.dst), d.num_nodes, nparts,
        edge_weight=w, e_tile=32, s_tile=32,
    )
    return mesh, d, g, w, pg


def _single_device_loss_and_step(params, opt_state, tx, d, g, w):
    def loss_fn(p):
        x = jnp.asarray(d.x)
        n_layers = len(p) // 2
        for i in range(n_layers):
            x = x @ p[f"w{i}"]
            x = ref.gather_weight_scatter_ref(
                g.src, g.dst, jnp.asarray(w), x, d.num_nodes
            ) + p[f"b{i}"]
            if i + 1 < n_layers:
                x = jax.nn.relu(x)
        ls = jax.nn.log_softmax(x.astype(jnp.float32))
        y = jnp.asarray(d.y)
        nll = -jnp.take_along_axis(ls, y[:, None].astype(jnp.int32), axis=1)[:, 0]
        m = jnp.asarray(d.train_mask).astype(jnp.float32)
        return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


@pytest.mark.parametrize("nparts", [2, 4])
def test_dist_train_step_matches_single_device(nparts):
    mesh, d, g, w, pg = _setup(nparts)
    params = init_gcn_params(jax.random.PRNGKey(0), [8, 16, 4])
    tx = optax.adam(1e-2)
    opt_d = tx.init(params)
    opt_s = tx.init(params)
    step = make_dist_train_step(tx, pg, mesh, backend="reference")
    x, y, m = shard_inputs(d.x, d.y, d.train_mask, pg, mesh)
    p_d, p_s = params, params
    for i in range(3):
        p_d, opt_d, loss_d = step(p_d, opt_d, x, y, m)
        p_s, opt_s, loss_s = _single_device_loss_and_step(p_s, opt_s, tx, d, g, w)
        np.testing.assert_allclose(float(loss_d), float(loss_s), rtol=1e-4)
    for k in p_s:
        np.testing.assert_allclose(
            np.asarray(p_d[k]), np.asarray(p_s[k]), rtol=1e-3, atol=1e-5
        )


def test_dist_forward_part_count_invariance():
    mesh2, d, g, w, pg2 = _setup(2, seed=3)
    mesh4, _, _, _, pg4 = _setup(4, seed=3)
    params = init_gcn_params(jax.random.PRNGKey(1), [8, 16, 4])
    x2, _, _ = shard_inputs(d.x, d.y, d.train_mask, pg2, mesh2)
    x4, _, _ = shard_inputs(d.x, d.y, d.train_mask, pg4, mesh4)
    from geot_tpu.parallel import unblock_nodes

    o2 = gcn_forward(params, x2, pg2, mesh2, backend="reference")
    o4 = gcn_forward(params, x4, pg4, mesh4, backend="reference")
    np.testing.assert_allclose(
        np.asarray(unblock_nodes(o2, pg2)),
        np.asarray(unblock_nodes(o4, pg4)),
        rtol=1e-4,
        atol=1e-5,
    )
