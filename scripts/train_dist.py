"""Distributed (multi-chip) GCN training driver.

The multi-chip counterpart of `scripts/train.py` (the reference has no
distributed layer at all — SURVEY §2.7): edge-balanced dst-range
partitioning, padded all-to-all halo exchange, replicated parameters.
Runs on any mesh — real TPU slices, or a virtual CPU mesh for functional
work:

  python scripts/train_dist.py --dataset pubmed --parts 8 --epochs 50 \
      --force-cpu-devices 8
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="pubmed")
    p.add_argument("--data-dir", default="data")
    p.add_argument("--parts", type=int, default=0, help="0 = all devices")
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--num-layers", type=int, default=3)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--backend", choices=["auto", "pallas", "reference"],
                   default="auto")
    p.add_argument("--force-cpu-devices", type=int, default=0,
                   help="run on N virtual CPU devices (testing without a pod)")
    args = p.parse_args()

    import jax

    if args.force_cpu_devices:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.force_cpu_devices)
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh

    from geot_tpu.graph.datasets import get_dataset, synthetic_classification_graph
    from geot_tpu.models.conv import gcn_edge_weight, prepare_graph
    from geot_tpu.models.train import accuracy
    from geot_tpu.parallel import partition_graph, unblock_nodes
    from geot_tpu.parallel.dist_train import (
        gcn_forward,
        init_gcn_params,
        make_dist_train_step,
        shard_inputs,
    )

    d = get_dataset(args.dataset, args.data_dir)
    if d.x is None or d.y is None:
        d = synthetic_classification_graph(
            d.num_nodes, d.num_edges, 8, feat_dim=64, name=d.name
        )
    devs = jax.devices()
    P = args.parts or len(devs)
    mesh = Mesh(np.array(devs[:P]), ("parts",))
    print(f"{d.name}: {d.num_nodes} nodes, {d.num_edges} edges on {P} devices "
          f"({devs[0].device_kind})")

    # GCN norm on the full self-looped graph, then partition with baked weights
    g = prepare_graph(d.src, d.dst, d.num_nodes, add_self_loops=True)
    w = np.asarray(gcn_edge_weight(g))
    t0 = time.time()
    pg = partition_graph(
        np.asarray(g.src), np.asarray(g.dst), d.num_nodes, P, edge_weight=w
    )
    print(f"partition: {time.time()-t0:.1f}s halo={pg.halo} rows/peer, "
          f"nodes/part={pg.nodes_per_part}")

    n_cls = int(d.y.max()) + 1
    dims = [d.x.shape[1]] + [args.hidden] * (args.num_layers - 1) + [n_cls]
    params = init_gcn_params(jax.random.PRNGKey(0), dims)
    tx = optax.adam(args.lr)
    opt = tx.init(params)
    step = make_dist_train_step(tx, pg, mesh, backend=args.backend)
    x, y, m = shard_inputs(d.x.astype(np.float32), d.y.astype(np.int32),
                           d.train_mask, pg, mesh)

    t0 = time.time()
    for epoch in range(args.epochs):
        params, opt, loss = step(params, opt, x, y, m)
        if epoch % 10 == 9:
            print(f"epoch {epoch+1}: loss={float(loss):.4f}")
    jax.device_get(jnp.asarray(loss))
    dt = (time.time() - t0) / args.epochs
    print(f"mean epoch time: {dt*1e3:.1f} ms "
          f"({d.num_edges * args.num_layers / dt / 1e6:.1f}M edge-aggs/s fwd)")

    logits = unblock_nodes(gcn_forward(params, x, pg, mesh,
                                       backend=args.backend), pg)
    for name, mask in (("train", d.train_mask), ("val", d.val_mask),
                       ("test", d.test_mask)):
        if mask is not None:
            acc = accuracy(logits, jnp.asarray(d.y.astype(np.int32)),
                           jnp.asarray(mask))
            print(f"{name}_acc: {float(acc):.4f}")


if __name__ == "__main__":
    main()
