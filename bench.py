"""Headline benchmark: fused SpMM (gather_weight_scatter) throughput on one
chip, reported as fraction of the HBM roofline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

`value` is the measured fraction of the chip's HBM-bandwidth roofline for
the dst-sorted weighted SpMM on an ogbn-arxiv-shaped graph at N=128 (the
reference's headline op and largest sweep point,
`benchmark/bench_spmm.py:140-165`). `vs_baseline` normalizes by the
BASELINE.md target (≥0.80 of roofline), so ≥1.0 means target met.

The bytes model is speed-of-light (each gathered row, index, weight read
once; output written once) — NOT the implementation's actual traffic — so
the number is an honest end-to-end efficiency, directly comparable across
implementations.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from geot_tpu.graph.datasets import DATASET_SHAPES, synthetic_graph
    from geot_tpu.models.conv import prepare_graph
    from geot_tpu.ops import api as ops
    from geot_tpu.utils.roofline import hbm_bandwidth_gbps, spmm_bytes
    from geot_tpu.utils.timing import timeit

    on_tpu = jax.default_backend() in ("tpu", "axon")
    backend = "pallas" if on_tpu else "reference"
    # headline = the north-star config (BASELINE.md row 1: ogbn-products,
    # per chip); arxiv measured alongside for cross-round comparability.
    # Override with GEOT_BENCH_DATASET=name[,name...].
    default = "ogbn-products,ogbn-arxiv" if on_tpu else "ogbn-arxiv"
    datasets = os.environ.get("GEOT_BENCH_DATASET", default).split(",")
    n_feat = int(os.environ.get("GEOT_BENCH_FEATURES", "128"))
    target = 0.80
    results = {}
    for dataset in datasets:
        n_nodes, n_edges, _, _ = DATASET_SHAPES[dataset]
        d = synthetic_graph(n_nodes, n_edges, power=1.0, seed=0, name=dataset)
        rng = np.random.default_rng(0)
        w_host = rng.standard_normal(d.num_edges).astype(np.float32)
        # static weights baked into the graph (the GCN model path: weights
        # are graph data, slot-ordered once at build). BAT-only layouts at
        # large scale: the slot plans are ~3 GB of HBM the BAT execution
        # path never reads (and minutes of host build).
        layouts = ("bat",) if n_edges > 20_000_000 else ("bat", "slot")
        from geot_tpu.graph.cache import cached_build

        g = cached_build(
            f"bench-{dataset}-N{n_feat}-{'-'.join(layouts)}",
            lambda: prepare_graph(
                d.src, d.dst, n_nodes, add_self_loops=False,
                edge_weight=w_host, layouts=layouts,
            ),
        )
        x = jnp.asarray(
            rng.standard_normal((n_nodes, n_feat)).astype(np.float32)
        )
        # the graph is a jit ARGUMENT (closing over it would embed the plan
        # arrays as program constants — multi-GB for products-scale graphs)
        fn = jax.jit(lambda g, x: ops.segment_spmm(g, x, backend=backend))
        iters = int(
            os.environ.get(
                "GEOT_BENCH_ITERS", 15 if n_edges > 20_000_000 else 50
            )
        )
        t = timeit(fn, g, x, warmup=3, iters=iters)
        sol_bytes = spmm_bytes(
            g.num_edges, n_feat, n_nodes, n_nodes,
            weighted=True, fused_gather=True,
        )
        bw = hbm_bandwidth_gbps() * 1e9 if on_tpu else 50e9  # CPU placeholder
        results[dataset] = {
            "frac": (sol_bytes / t) / bw,
            "time_ms": round(t * 1e3, 4),
            "edges_per_s": round(g.num_edges / t, 1),
        }
        del g, x

    head = datasets[0]
    extra = {
        "backend": backend,
        "device": str(jax.devices()[0].device_kind),
    }
    for ds, r in results.items():
        extra[ds] = {
            "roofline_fraction": round(r["frac"], 4),
            "time_ms": r["time_ms"],
            "edges_per_s": r["edges_per_s"],
        }
    print(
        json.dumps(
            {
                "metric": f"spmm_roofline_fraction[{head},N={n_feat}]",
                "value": round(results[head]["frac"], 4),
                "unit": "fraction_of_hbm_roofline",
                "vs_baseline": round(results[head]["frac"] / target, 4),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
