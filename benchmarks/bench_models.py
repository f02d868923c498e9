"""End-to-end model forward benchmark: model × dataset × hidden → CSV.

TPU counterpart of the reference model drivers' timing runs
(`models/gcn.py:42-60`: GCN/GIN/GraphSAGE × {flickr, ogbn-arxiv, reddit2}
× hidden {32,64}, 100 iters → `model_result.csv`; artifact exp5 end-to-end,
`artifact/exp5/end2end.py:11-47`). Variants: the Pallas fused path vs the
XLA reference backend (playing PyG_Sparse's role as the normalization
base).

Usage:
  python benchmarks/bench_models.py --models gcn gin graphsage \
      --datasets flickr ogbn-arxiv --hidden 32 64 --out model_result.csv
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

    from geot_tpu.graph.datasets import DATASET_SHAPES, synthetic_graph
    from geot_tpu.models import MODELS, prepare_graph
    from geot_tpu.utils.timing import timeit

    rows = []
    for ds in args.datasets:
        n_nodes, n_edges, feat, n_cls = DATASET_SHAPES[ds]
        if args.max_edges and n_edges > args.max_edges:
            print(f"skip {ds}")
            continue
        d = synthetic_graph(n_nodes, n_edges, power=1.0, seed=0)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((n_nodes, feat)).astype(np.float32))
        graphs = {}
        for mname in args.models:
            model_cls, needs_loops = MODELS[mname]
            key = (needs_loops, mname == "gcn")
            if key not in graphs:
                graphs[key] = prepare_graph(
                    d.src,
                    d.dst,
                    n_nodes,
                    add_self_loops=needs_loops,
                    normalize="gcn" if mname in ("gcn", "sgc", "appnp") else None,
                )
            g = graphs[key]
            dtype = jnp.bfloat16 if args.dtype == "bf16" else None
            for hidden in args.hidden:
                model = model_cls(
                    hidden_features=hidden,
                    num_layers=args.num_layers,
                    out_features=n_cls,
                )
                # params stay f32 masters; bf16 is the COMPUTE dtype
                # (activations + casts inside the layers)
                try:
                    # init under jit: eager-mode chunked gathers at
                    # reddit2 scale churn multi-GB transients and can OOM
                    # the chip (campaign r5 models stage died in gin init)
                    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, g)
                except Exception as exc:
                    print(f"{ds} {mname} h={hidden}: init FAILED {exc}")
                    continue
                for backend in ("pallas", "reference"):
                    m2 = model_cls(
                        hidden_features=hidden,
                        num_layers=args.num_layers,
                        out_features=n_cls,
                        backend=backend,
                        dtype=dtype,
                    )
                    fn = jax.jit(lambda p, xx, gg: m2.apply(p, xx, gg))
                    try:
                        t = timeit(fn, params, x, g, warmup=3, iters=args.iters)
                    except Exception as exc:
                        print(f"{ds} {mname} h={hidden} {backend}: FAILED {exc}")
                        continue
                    rows.append(
                        dict(
                            dataset=ds,
                            model=mname,
                            hidden=hidden,
                            layers=args.num_layers,
                            backend=backend,
                            dtype=args.dtype,
                            time_ms=round(t * 1e3, 4),
                        )
                    )
                    print(rows[-1], flush=True)
                    if args.out:
                        hdr = not os.path.exists(args.out)
                        with open(args.out, "a", newline="") as f:
                            w = csv.DictWriter(f, fieldnames=list(rows[-1]))
                            if hdr:
                                w.writeheader()
                            w.writerow(rows[-1])
    if args.out and rows:
        print(f"wrote {len(rows)} rows to {args.out}")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--models", nargs="+", default=["gcn", "gin", "graphsage", "gat"])
    p.add_argument("--datasets", nargs="+", default=["flickr", "ogbn-arxiv"])
    p.add_argument("--hidden", nargs="+", type=int, default=[32, 64])
    p.add_argument("--num-layers", type=int, default=3)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--max-edges", type=int, default=0)
    p.add_argument("--dtype", choices=["f32", "bf16"], default="f32")
    p.add_argument("--out", default="")
    run(p.parse_args())


if __name__ == "__main__":
    main()
