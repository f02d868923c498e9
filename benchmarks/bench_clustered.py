"""Clustered-vs-uniform locality benchmark → results/clustered_vs_uniform.csv.

Measures the hybrid stream+gather path against the pure-BAT gather path at
the north-star scale (ogbn-products shape, N=128) over the community-mixing
knob — the experiment behind RESULTS' locality table (VERDICT r3/r4: the
FlashSparse-baseline role re-litigated on TPU; `graph/block_format.py`
retired in favor of the census + stream split this measures).

Each row: mixing, stream_frac, hybrid ms, pure-BAT ms, speedup, edges/s.
mixing=1.0 is the uniform-src worst case (census rejects streaming; hybrid
degenerates to BAT by construction — asserted here).

Usage:
  python benchmarks/bench_clustered.py --mixings 0.1 0.3 0.5 1.0 \
      --out results/clustered_vs_uniform.csv
"""

from __future__ import annotations

import argparse
import csv
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(args) -> None:
    import jax
    import jax.numpy as jnp

    from geot_tpu.graph.cache import cached_build
    from geot_tpu.graph.datasets import (
        DATASET_SHAPES,
        synthetic_clustered_graph,
        synthetic_graph,
    )
    from geot_tpu.models.conv import prepare_graph
    from geot_tpu.ops import api as ops
    from geot_tpu.utils.timing import timeit

    n_nodes, n_edges, _, _ = DATASET_SHAPES[args.dataset]
    rng = np.random.default_rng(0)
    w_host = rng.standard_normal(n_edges).astype(np.float32)
    x = jnp.asarray(
        rng.standard_normal((n_nodes, args.features)).astype(np.float32)
    )
    if args.dtype == "bf16":
        x = x.astype(jnp.bfloat16)

    def make_edges(mixing: float):
        if mixing >= 1.0:
            return synthetic_graph(n_nodes, n_edges, power=1.0, seed=0)
        return synthetic_clustered_graph(
            n_nodes, n_edges, mixing=mixing, mean_community=2000,
            power=1.0, seed=0,
        )

    rows = []
    for mixing in args.mixings:
        d = make_edges(mixing)
        tag = f"clu-{args.dataset}-m{mixing}-N{args.features}"

        g_h = cached_build(
            tag + "-hyb",
            lambda: prepare_graph(
                d.src, d.dst, n_nodes, add_self_loops=False,
                edge_weight=w_host, layouts=("bat", "stream"),
            ),
        )
        g_b = cached_build(
            tag + "-bat",
            lambda: prepare_graph(
                d.src, d.dst, n_nodes, add_self_loops=False,
                edge_weight=w_host, layouts=("bat",),
            ),
        )
        # NOTE: mixing=1.0 may still stream — the post-gather-fix cost
        # model streams dense zipf-hub cells even on uniform graphs (the
        # round-3 "uniform can't stream" rule was an artifact of the
        # mis-calibrated rest rate; RESULTS.md r5). The graceful-degradation
        # property is now asserted by tests/test_dispatch.py on the census
        # MARGIN, not by hyb being absent here.
        stream_frac = 0.0
        if g_h.hyb is not None:
            streamed = sum(int(sp.num_edges) for sp in g_h.hyb.stream)
            stream_frac = streamed / g_h.num_edges

        fn_h = functools.partial(
            jax.jit(lambda gg, x: ops.segment_spmm(gg, x, backend="pallas")),
            g_h,
        )
        fn_b = functools.partial(
            jax.jit(lambda gg, x: ops.segment_spmm(gg, x, backend="pallas")),
            g_b,
        )
        t_h = timeit(fn_h, x, warmup=2, iters=args.iters)
        t_b = timeit(fn_b, x, warmup=2, iters=args.iters)
        rows.append(
            dict(
                dataset=args.dataset,
                mixing=mixing,
                features=args.features,
                dtype=args.dtype,
                nnz=g_h.num_edges,
                stream_frac=round(stream_frac, 4),
                hybrid_ms=round(t_h * 1e3, 2),
                pure_bat_ms=round(t_b * 1e3, 2),
                speedup=round(t_b / t_h, 3),
                edges_per_s=round(g_h.num_edges / t_h, 0),
            )
        )
        print(rows[-1], flush=True)
        if args.out:
            hdr = not os.path.exists(args.out)
            with open(args.out, "a", newline="") as f:
                wtr = csv.DictWriter(f, fieldnames=list(rows[-1]))
                if hdr:
                    wtr.writeheader()
                wtr.writerow(rows[-1])
        # one pair of products-scale graphs live at a time
        del g_h, g_b, fn_h, fn_b


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="ogbn-products")
    p.add_argument("--mixings", nargs="+", type=float,
                   default=[0.1, 0.3, 0.5, 1.0])
    p.add_argument("--features", type=int, default=128)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--dtype", choices=["f32", "bf16"], default="f32")
    p.add_argument("--out", default="")
    run(p.parse_args())


if __name__ == "__main__":
    main()
