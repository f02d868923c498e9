"""Distributed full-graph GCN training over a device mesh.

End-to-end multi-chip path (BASELINE config #5: 3-layer GCN on
ogbn-products, edge-partitioned): node features, labels, and masks are
sharded by destination-range over the mesh's 'parts' axis; every
aggregation is a `halo_spmm` (padded all-to-all + local Pallas segment
reduce); dense transforms run on the node-sharded activations (row-parallel
— XLA keeps them local, no collective); parameters are replicated and
gradients are combined by XLA's automatic psum through `jax.grad` of the
globally-sharded loss.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from geot_tpu.parallel.halo_spmm import block_nodes, halo_spmm, node_sharding
from geot_tpu.parallel.partition import PartitionedGraph

__all__ = ["init_gcn_params", "gcn_forward", "make_dist_train_step", "shard_inputs"]


def init_gcn_params(
    rng: jax.Array, dims: Sequence[int], dtype=jnp.float32
) -> dict:
    """Plain-pytree GCN parameters: dims = [in, hidden..., out]."""
    params = {}
    for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
        rng, k = jax.random.split(rng)
        scale = jnp.sqrt(2.0 / (a + b)).astype(dtype)
        params[f"w{i}"] = jax.random.normal(k, (a, b), dtype) * scale
        params[f"b{i}"] = jnp.zeros((b,), dtype)
    return params


def gcn_forward(
    params: dict,
    x: jax.Array,
    pg: PartitionedGraph,
    mesh: Mesh,
    *,
    backend: str = "auto",
) -> jax.Array:
    """L-layer GCN: x ← Â (x W_i) + b_i with ReLU between layers.
    GCN normalization is baked into pg's edge weights (partition the graph
    with `gcn_edge_weight`-style weights)."""
    n_layers = len(params) // 2
    for i in range(n_layers):
        x = x @ params[f"w{i}"]
        x = halo_spmm(x, pg, mesh, backend=backend) + params[f"b{i}"]
        if i + 1 < n_layers:
            x = jax.nn.relu(x)
    return x


def shard_inputs(x, y, mask, pg: PartitionedGraph, mesh: Mesh):
    """Pad node-indexed arrays to the partition size and shard over parts."""
    ns = node_sharding(mesh)
    xp = jax.device_put(block_nodes(jnp.asarray(x), pg), ns)
    yp = jax.device_put(block_nodes(jnp.asarray(y), pg), ns)
    mp = jax.device_put(block_nodes(jnp.asarray(mask), pg), ns)
    return xp, yp, mp


def make_dist_train_step(
    tx: optax.GradientTransformation,
    pg: PartitionedGraph,
    mesh: Mesh,
    *,
    backend: str = "auto",
):
    """jitted (params, opt_state, x, y, mask) → (params, opt_state, loss).

    Shardings: params/opt_state replicated, node arrays sharded over
    'parts'. The masked cross-entropy reduces over the global node axis, so
    `jax.grad` inserts the gradient psum automatically.
    """

    def loss_fn(params, x, y, mask):
        logits = gcn_forward(params, x, pg, mesh, backend=backend)
        ls = jax.nn.log_softmax(logits.astype(jnp.float32))
        nll = -jnp.take_along_axis(ls, y[:, None].astype(jnp.int32), axis=1)[:, 0]
        m = mask.astype(jnp.float32)
        return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)

    repl = NamedSharding(mesh, P())
    ns = node_sharding(mesh)

    @functools.partial(
        jax.jit,
        in_shardings=(repl, repl, ns, ns, ns),
        out_shardings=(repl, repl, repl),
    )
    def step(params, opt_state, x, y, mask):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y, mask)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
