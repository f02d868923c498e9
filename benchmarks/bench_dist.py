"""Distributed halo-SpMM scaling benchmark: per-step time vs mesh size.

The measurement pathway for the multi-chip north star (BASELINE.md: ≥75%
scaling efficiency to 8 chips). On real multi-chip hardware this reports
true scaling; on a single host it still runs on a virtual CPU mesh
(JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8) to
validate the pathway end-to-end — those numbers exercise the code path but
measure host cores, not ICI.

Usage:
  python benchmarks/bench_dist.py --dataset flickr --parts 1 2 4 8 \
      --features 64 --iters 20 --out results/dist_scaling.csv
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(args) -> None:
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from geot_tpu.graph.datasets import DATASET_SHAPES, synthetic_graph
    from geot_tpu.parallel.halo_spmm import (
        block_nodes,
        halo_spmm,
        node_sharding,
    )
    from geot_tpu.parallel.partition import partition_graph
    from geot_tpu.utils.timing import timeit

    n_nodes, n_edges, _, _ = DATASET_SHAPES[args.dataset]
    d = synthetic_graph(n_nodes, n_edges, power=1.0, seed=0)
    src_a, dst_a = np.asarray(d.src), np.asarray(d.dst)
    if args.reorder == "rcm":
        # cluster the node id space before contiguous-range partitioning:
        # on community-structured graphs this moves most edges into the
        # interior (no-communication) class
        from geot_tpu.graph.reorder import apply_order, rcm_order

        order = rcm_order(src_a, dst_a, n_nodes)
        src_a, dst_a, _ = apply_order(order, src_a, dst_a)
        d = type(d)(
            src=src_a.astype(np.int32), dst=dst_a.astype(np.int32),
            num_nodes=n_nodes,
        )
    rng = np.random.default_rng(0)
    # symmetric-norm-style weights computed directly on the edge list
    deg = np.bincount(np.asarray(d.dst), minlength=n_nodes).astype(np.float32)
    dis = np.where(deg > 0, deg, 1.0) ** -0.5
    w = (dis[np.asarray(d.src)] * dis[np.asarray(d.dst)]).astype(np.float32)
    x_host = rng.standard_normal((n_nodes, args.features)).astype(np.float32)

    devices = np.asarray(jax.devices())
    rows = []
    t1 = None
    for p in args.parts:
        if p > len(devices):
            print(f"skip P={p} (only {len(devices)} devices)")
            continue
        mesh = Mesh(devices[:p], ("parts",))
        pg = partition_graph(d.src, d.dst, n_nodes, p, edge_weight=np.asarray(w))
        xp = jax.device_put(
            block_nodes(jnp.asarray(x_host), pg), node_sharding(mesh)
        )
        fn = jax.jit(lambda xx: halo_spmm(xx, pg, mesh))
        t = timeit(fn, xp, warmup=3, iters=args.iters)
        if p == args.parts[0]:
            t1 = t * args.parts[0]  # normalize vs the smallest mesh
        eff = (t1 / (p * t)) if t1 else 1.0
        halo_frac = pg.halo * pg.num_parts / max(pg.nodes_per_part, 1)
        rows.append(
            dict(
                dataset=args.dataset,
                features=args.features,
                parts=p,
                time_ms=round(t * 1e3, 4),
                scaling_eff=round(eff, 4),
                halo_rows_per_part=pg.halo * pg.num_parts,
                interior_edges=(
                    int(np.asarray(pg.plan_int.mask).sum())
                    if pg.plan_int is not None
                    else int((np.asarray(pg.bat_int.dst3) >= 0).sum())
                ),
                boundary_edges=(
                    int(np.asarray(pg.plan.mask).sum())
                    if pg.plan is not None
                    else int((np.asarray(pg.bat.dst3) >= 0).sum())
                ),
                device=str(devices[0].device_kind),
            )
        )
        print(rows[-1], flush=True)
        del halo_frac
    if args.out and rows:
        hdr = not os.path.exists(args.out)
        with open(args.out, "a", newline="") as f:
            wtr = csv.DictWriter(f, fieldnames=list(rows[0]))
            if hdr:
                wtr.writeheader()
            wtr.writerows(rows)
        print(f"wrote {len(rows)} rows to {args.out}")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="flickr")
    p.add_argument("--parts", nargs="+", type=int, default=[1, 2, 4, 8])
    p.add_argument("--features", type=int, default=64)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--reorder", choices=["none", "rcm"], default="none")
    p.add_argument("--out", default="")
    run(p.parse_args())


if __name__ == "__main__":
    main()
