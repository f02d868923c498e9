"""Multi-process distributed training worker (CPU backend).

Usage: dist_worker.py <coordinator> <num_processes> <process_id> \
           [devices_per_process=4] [num_nodes=96]

Each process contributes `devices_per_process` CPU devices to a global
'parts' mesh and runs three steps of the distributed GCN train step
(`parallel/dist_train.py`) on an identical synthetic classification
graph. Prints one JSON line with the per-step losses; the launching test
asserts cross-process agreement and equality with the single-process run
(SURVEY §4: multi-host tests on CPU via jax.distributed). Exercises the
real multi-controller path: global mesh spanning non-addressable devices,
`jax.make_array_from_callback` sharding, cross-process collectives
through the coordination service. `num_nodes` not divisible by the part
count exercises the uneven dst-range split.
"""

import json
import sys

import jax

# force the CPU backend even where a TPU plugin self-registers (the env var
# alone can be stomped by sitecustomize-style platform hooks)
DEVS_PER_PROC = int(sys.argv[4]) if len(sys.argv) > 4 else 4
NUM_NODES = int(sys.argv[5]) if len(sys.argv) > 5 else 96
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", DEVS_PER_PROC)


def main() -> None:
    coordinator, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=num_procs, process_id=pid
    )
    import numpy as np
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

    devs = jax.devices()  # num_procs * DEVS_PER_PROC global
    assert len(devs) == DEVS_PER_PROC * num_procs, devs
    mesh = Mesh(np.array(devs), ("parts",))

    d = synthetic_classification_graph(NUM_NODES, 600, 4, feat_dim=8, seed=0)
    g = prepare_graph(
        d.src, d.dst, d.num_nodes, add_self_loops=True, e_tile=32, s_tile=32
    )
    w = np.asarray(gcn_edge_weight(g))
    pg = partition_graph(
        np.asarray(g.src), np.asarray(g.dst), d.num_nodes, len(devs),
        edge_weight=w, e_tile=32, s_tile=32,
    )

    ns = node_sharding(mesh)

    def put(arr):
        blocked = np.asarray(block_nodes(jnp.asarray(arr), pg))
        return jax.make_array_from_callback(
            blocked.shape, ns, lambda idx: blocked[idx]
        )

    x = put(d.x.astype(np.float32))
    y = put(d.y.astype(np.int32))
    m = put(d.train_mask)

    params = init_gcn_params(jax.random.PRNGKey(1), [8, 16, 4])
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    step = make_dist_train_step(tx, pg, mesh, backend="reference")

    losses = []
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, x, y, m)
        losses.append(float(loss))
    print(json.dumps({"pid": pid, "losses": losses}), flush=True)


if __name__ == "__main__":
    main()
