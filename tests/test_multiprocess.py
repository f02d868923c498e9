"""Multi-process distributed training parity (CPU backend).

SURVEY §4 "multi-host tests can run on CPU with jax.distributed": launches
real OS processes that form one 8-device global mesh through the JAX
coordination service and run `make_dist_train_step` (the DCN/multi-host
code path the reference lacks). Parametrized over process topology
(2 proc × 4 dev and 4 proc × 2 dev) and over an uneven node/part split
(97 nodes over 8 dst-range parts). Asserts (a) all processes agree, and
(b) the losses match a single-process 8-device run of the identical
configuration step-for-step.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch_workers(nprocs: int, devs_per_proc: int, num_nodes: int):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "scripts", "dist_worker.py"),
             f"localhost:{port}", str(nprocs), str(pid),
             str(devs_per_proc), str(num_nodes)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for pid in range(nprocs)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    return outs


def _single_process_losses(num_nodes: int):
    """8-device single-process run of the identical configuration (this
    test process has 8 virtual CPU devices via conftest)."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh

    from geot_tpu.graph.datasets import synthetic_classification_graph
    from geot_tpu.models.conv import gcn_edge_weight, prepare_graph
    from geot_tpu.parallel import partition_graph
    from geot_tpu.parallel.dist_train import (
        init_gcn_params,
        make_dist_train_step,
    )
    from geot_tpu.parallel.halo_spmm import block_nodes, node_sharding

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 devices")
    mesh = Mesh(np.array(devs[:8]), ("parts",))
    d = synthetic_classification_graph(num_nodes, 600, 4, feat_dim=8, seed=0)
    g = prepare_graph(d.src, d.dst, d.num_nodes, add_self_loops=True,
                      e_tile=32, s_tile=32)
    w = np.asarray(gcn_edge_weight(g))
    pg = partition_graph(np.asarray(g.src), np.asarray(g.dst), d.num_nodes, 8,
                         edge_weight=w, e_tile=32, s_tile=32)
    ns = node_sharding(mesh)
    put = lambda a: jax.device_put(block_nodes(jnp.asarray(a), pg), ns)
    x, y, m = put(d.x.astype(np.float32)), put(d.y.astype(np.int32)), put(d.train_mask)
    params = init_gcn_params(jax.random.PRNGKey(1), [8, 16, 4])
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    step = make_dist_train_step(tx, pg, mesh, backend="reference")
    ref_losses = []
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, x, y, m)
        ref_losses.append(float(loss))
    return ref_losses


@pytest.mark.slow
@pytest.mark.parametrize(
    "nprocs,devs_per_proc,num_nodes",
    [
        (2, 4, 96),   # original topology, even 12-node parts
        (4, 2, 97),   # more processes, fewer local devices, uneven split
    ],
    ids=["2proc_even", "4proc_uneven"],
)
def test_dist_train_matches_single_process(nprocs, devs_per_proc, num_nodes):
    outs = _launch_workers(nprocs, devs_per_proc, num_nodes)

    losses = [o["losses"] for o in outs]
    assert all(len(l) == 3 for l in losses)
    for l in losses[1:]:  # replicated loss: bit-identical across processes
        np.testing.assert_allclose(losses[0], l, rtol=0, atol=0)

    ref_losses = _single_process_losses(num_nodes)
    np.testing.assert_allclose(losses[0], ref_losses, rtol=1e-6, atol=1e-7)
