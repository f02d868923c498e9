"""Multi-process (2 proc × 4 CPU devices) distributed training parity.

SURVEY §4 "multi-host tests can run on CPU with jax.distributed": launches
two real OS processes that form one 8-device global mesh through the JAX
coordination service and run `make_dist_train_step` (the DCN/multi-host
code path the reference lacks). Asserts (a) both processes agree, and
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


@pytest.mark.slow
def test_two_process_dist_train_matches_single_process():
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "scripts", "dist_worker.py"),
             f"localhost:{port}", "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for pid in range(2)
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

    l0, l1 = outs[0]["losses"], outs[1]["losses"]
    assert len(l0) == 3
    np.testing.assert_allclose(l0, l1, rtol=0, atol=0)  # replicated loss

    # single-process 8-device run of the SAME config (this test process has
    # 8 virtual CPU devices via conftest)
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
    d = synthetic_classification_graph(96, 600, 4, feat_dim=8, seed=0)
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
    np.testing.assert_allclose(l0, ref_losses, rtol=1e-6, atol=1e-7)
