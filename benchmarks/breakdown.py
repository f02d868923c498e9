"""Per-component time breakdown: SpMM vs MatMul vs Others.

TPU counterpart of the reference's CUDA-time breakdown profiler
(`models/breakdown.py:41-88`: torch.autograd profiler shares for
`torch_sparse::spmm` / `geot::gather_weight_scatter` vs `aten::mm` vs
others, artifact exp5). Here each component is timed as its own jitted
callable on identical shapes, which measures the same decomposition
without needing a trace parser:

  python benchmarks/breakdown.py --dataset ogbn-arxiv --hidden 64
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

    from geot_tpu.graph.datasets import DATASET_SHAPES, synthetic_graph
    from geot_tpu.models import GCN, prepare_graph
    from geot_tpu.ops import api as ops
    from geot_tpu.utils.timing import timeit

    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="ogbn-arxiv")
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--num-layers", type=int, default=3)
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args()

    n_nodes, n_edges, feat, n_cls = DATASET_SHAPES[args.dataset]
    d = synthetic_graph(n_nodes, n_edges, power=1.0, seed=0)
    g = prepare_graph(d.src, d.dst, n_nodes, add_self_loops=True, normalize="gcn")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n_nodes, feat)).astype(np.float32))

    model = GCN(
        hidden_features=args.hidden, num_layers=args.num_layers, out_features=n_cls
    )
    params = model.init(jax.random.PRNGKey(0), x, g)
    t_total = timeit(
        jax.jit(lambda p, xx, gg: model.apply(p, xx, gg)), params, x, g,
        iters=args.iters,
    )

    h = jnp.asarray(rng.standard_normal((n_nodes, args.hidden)).astype(np.float32))
    t_spmm1 = timeit(
        jax.jit(lambda gg, xx: ops.segment_spmm(gg, xx)), g, h, iters=args.iters
    )
    t_spmm = t_spmm1 * args.num_layers

    w_in = jnp.asarray(rng.standard_normal((feat, args.hidden)).astype(np.float32))
    w_h = jnp.asarray(
        rng.standard_normal((args.hidden, args.hidden)).astype(np.float32)
    )
    t_mm = timeit(jax.jit(lambda a, b: a @ b), x, w_in, iters=args.iters) + (
        args.num_layers - 1
    ) * timeit(jax.jit(lambda a, b: a @ b), h, w_h, iters=args.iters)

    other = max(t_total - t_spmm - t_mm, 0.0)
    print(
        json.dumps(
            dict(
                dataset=args.dataset,
                hidden=args.hidden,
                total_ms=round(t_total * 1e3, 3),
                spmm_pct=round(100 * t_spmm / t_total, 1),
                matmul_pct=round(100 * t_mm / t_total, 1),
                other_pct=round(100 * other / t_total, 1),
            )
        )
    )


if __name__ == "__main__":
    main()
