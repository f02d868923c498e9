"""Multi-chip scaling benchmark: edges/s vs mesh size for the halo SpMM.

The BASELINE.md target is ≥75% edges/s scaling efficiency at 2+ hosts for
an edge-partitioned 3-layer GCN. On this machine only one real TPU chip is
visible, so by default this measures the *functional* scaling path on a
virtual CPU mesh (communication volumes and partition balance are real;
absolute times are not TPU times — the harness prints both the measured
throughput and the partition/halo statistics that determine on-chip
efficiency). On a real multi-chip slice the same script reports honest
edges/s and efficiency.

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/bench_scaling.py --dataset flickr --parts 1 2 4 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from geot_tpu.graph.datasets import DATASET_SHAPES, synthetic_graph
    from geot_tpu.parallel import block_nodes, halo_spmm, node_sharding, partition_graph
    from geot_tpu.utils.timing import timeit

    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="flickr")
    p.add_argument("--features", type=int, default=64)
    p.add_argument("--parts", nargs="+", type=int, default=[1, 2, 4, 8])
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    n_nodes, n_edges, _, _ = DATASET_SHAPES[args.dataset]
    d = synthetic_graph(n_nodes, n_edges, power=1.0, seed=0)
    rng = np.random.default_rng(0)
    x_host = rng.standard_normal((n_nodes, args.features)).astype(np.float32)
    devs = jax.devices()
    base_rate = None
    for P in args.parts:
        if P > len(devs):
            print(f"skip parts={P} (only {len(devs)} devices)")
            continue
        mesh = Mesh(np.array(devs[:P]), ("parts",))
        pg = partition_graph(d.src, d.dst, n_nodes, P)
        xp = jax.device_put(
            block_nodes(jnp.asarray(x_host), pg), node_sharding(mesh)
        )
        fn = jax.jit(lambda xx: halo_spmm(xx, pg, mesh))
        t = timeit(fn, xp, warmup=3, iters=args.iters)
        rate = n_edges / t
        if base_rate is None:
            base_rate = rate
        # halo volume: rows exchanged per step (both directions counted once)
        halo_rows = float(np.asarray(pg.send_mask).sum())
        eff = rate / (base_rate * P / args.parts[0])
        print(
            json.dumps(
                dict(
                    parts=P,
                    time_ms=round(t * 1e3, 3),
                    edges_per_s=round(rate, 0),
                    scaling_efficiency=round(eff, 4),
                    halo_rows=int(halo_rows),
                    halo_bytes_per_step=int(halo_rows * args.features * 4),
                    edge_balance=[
                        int(
                            np.sum(
                                (d.dst >= pg.part_start[q])
                                & (d.dst < pg.part_start[q + 1])
                            )
                        )
                        for q in range(P)
                    ],
                )
            )
        )


if __name__ == "__main__":
    main()
