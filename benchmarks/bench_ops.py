"""Op microbenchmark sweep: datasets × feature sizes × backends → CSV.

TPU counterpart of the reference's op benchmarks
(`benchmark/bench_index_scatter.py:100-112`: 8 datasets × N ∈ {1..128} vs
pyg/torch/triton baselines → `benchop_index_scatter.csv`;
`benchmark/bench_spmm.py:140-165` → `benchop_spmm.csv`). Baselines here are
the XLA-native alternatives a JAX user would otherwise write:
`jax.ops.segment_sum` (sorted) and scatter-add (`.at[].add`), playing the
role of pyg_scatter / torch index_add_.

Usage:
  python benchmarks/bench_ops.py --op spmm --datasets cora flickr \
      --features 32 64 128 --iters 50 --out benchop_spmm.csv
"""

from __future__ import annotations

import argparse
import csv
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_DATASETS = [
    "cora",
    "citeseer",
    "pubmed",
    "amazon_photo",
    "flickr",
    "ogbn-arxiv",
]
DEFAULT_FEATURES = [1, 2, 4, 8, 16, 32, 64, 128]


def run(args) -> None:
    import jax
    import jax.numpy as jnp

    from geot_tpu.graph.datasets import DATASET_SHAPES, synthetic_graph
    from geot_tpu.models.conv import prepare_graph
    from geot_tpu.ops import api as ops
    from geot_tpu.ops import reference as ref
    from geot_tpu.utils.roofline import sddmm_bytes, spmm_bytes
    from geot_tpu.utils.timing import timeit

    from geot_tpu.graph.cache import cached_build

    on_accel = jax.default_backend() != "cpu"
    rows = []
    for name in args.datasets:
        n_nodes, n_edges, _, _ = DATASET_SHAPES[name]
        if args.max_edges and n_edges > args.max_edges:
            print(f"skip {name} ({n_edges} edges > --max-edges)")
            continue
        # large graphs: fewer timed iters (each call is hundreds of ms and
        # the fenced timer's variance shrinks with call cost)
        iters = args.iters if n_edges < 5_000_000 else min(args.iters, 8)
        if name.startswith("rmat-s"):
            from geot_tpu.graph.datasets import rmat_graph

            d = rmat_graph(int(name[len("rmat-s"):]))
            n_nodes, n_edges = d.num_nodes, d.num_edges
        else:
            d = synthetic_graph(n_nodes, n_edges, power=1.0, seed=0)
        dst_sorted = np.sort(d.dst)
        rng = np.random.default_rng(0)
        w_host = rng.standard_normal(len(d.src)).astype(np.float32)
        graphs: dict = {}

        def graph_for(n_feat: int):
            # one graph per feature LAYOUT: narrow features get packed BAT
            # tiles (128//N edge groups per lane row) — the layout is set by
            # feature_hint at build, as a real caller would. spmm_static
            # bakes the weights at build (the model path).
            hint = n_feat if n_feat <= 64 else 128
            key = (hint, args.op == "spmm_static")
            if key not in graphs:
                # hold ONE graph at a time: each hint key is used for a
                # single feature size, and stacked reddit2-scale graphs
                # plus run transients exhausted HBM mid-grid
                graphs.clear()
                if args.op == "mh_spmm":
                    # multi-head runs in slot space (plan + plan_t only)
                    layouts = ("slot",)
                elif n_edges > 20_000_000:
                    layouts = ("bat",)
                else:
                    layouts = ("bat", "slot", "stream")
                graphs[key] = cached_build(
                    f"benchop-{name}-h{hint}-{args.op == 'spmm_static'}-"
                    f"{'-'.join(layouts)}",
                    lambda: prepare_graph(
                        d.src, d.dst, n_nodes, add_self_loops=False,
                        feature_hint=hint, layouts=layouts,
                        edge_weight=(
                            w_host if args.op == "spmm_static" else None
                        ),
                    ),
                )
            return graphs[key]

        w = jnp.asarray(w_host)
        for n_feat in args.features:
            g = graph_for(n_feat)
            x = jnp.asarray(
                rng.standard_normal((n_nodes, n_feat)).astype(np.float32)
            )
            ev = jnp.asarray(
                rng.standard_normal((g.num_edges, n_feat)).astype(np.float32)
            )
            if args.op == "spmm":
                variants = {
                    # functools.partial keeps the graph a jit *argument*
                    # (a closure would embed the plan as program constants)
                    "geot_pallas" if on_accel else "geot_interpret": (
                        functools.partial(
                            jax.jit(
                                lambda gg, x, w: ops.gather_weight_scatter(
                                    gg.src, gg.dst, w, x, n_nodes, graph=gg,
                                    backend="pallas",
                                )
                            ),
                            g,
                        )
                    ),
                    # production dispatch: measured table + latency-floor
                    # crossover pick the implementation per (shape, graph)
                    "geot_auto": functools.partial(
                        jax.jit(
                            lambda gg, x, w: ops.gather_weight_scatter(
                                gg.src, gg.dst, w, x, n_nodes, graph=gg,
                                backend="auto",
                            )
                        ),
                        g,
                    ),
                    # indices ride as jit ARGUMENTS (closed-over 23M-edge
                    # arrays become HLO constants and blow the remote-
                    # compile request limit at reddit2/products scale)
                    "xla_segment_sum": functools.partial(
                        jax.jit(
                            lambda s, d2, x, w: ref.gather_weight_scatter_ref(
                                s, d2, w, x, n_nodes
                            )
                        ),
                        g.src, g.dst,
                    ),
                    "xla_scatter_add": functools.partial(
                        jax.jit(
                            lambda s, d2, x, w: jnp.zeros(
                                (n_nodes, x.shape[1]), x.dtype
                            )
                            .at[d2]
                            .add(x[s] * w[:, None])
                        ),
                        g.src, g.dst,
                    ),
                    "args": (x, w),
                }
            elif args.op == "spmm_static":
                # the model path: weights baked at graph build
                # (`segment_spmm`, slot weights / BAT edge order / hybrid
                # stream — whatever build-time dispatch chose)
                variants = {
                    "geot_pallas" if on_accel else "geot_interpret": (
                        functools.partial(
                            jax.jit(
                                lambda gg, x: ops.segment_spmm(
                                    gg, x, backend="pallas"
                                )
                            ),
                            g,
                        )
                    ),
                    "geot_auto": functools.partial(
                        jax.jit(
                            lambda gg, x: ops.segment_spmm(
                                gg, x, backend="auto"
                            )
                        ),
                        g,
                    ),
                    "xla_segment_sum": functools.partial(
                        jax.jit(
                            lambda s, d2, ww, x: ref.gather_weight_scatter_ref(
                                s, d2, ww, x, n_nodes
                            )
                        ),
                        g.src, g.dst, g.edge_weight,
                    ),
                    "xla_scatter_add": functools.partial(
                        jax.jit(
                            lambda s, d2, ww, x: jnp.zeros(
                                (n_nodes, x.shape[1]), x.dtype
                            )
                            .at[d2]
                            .add(x[s] * ww[:, None])
                        ),
                        g.src, g.dst, g.edge_weight,
                    ),
                    "args": (x,),
                }
            elif args.op == "sddmm":
                # SDDMM under the reference's convention
                # (`test/test_sddmm.py:30-47`): per-edge dot of gathered
                # a[dst[e]]·b[src[e]] — the Pallas BAT kernel (dst rows
                # streamed as window blocks, round-5) vs XLA's fused
                # gather+mul+rowsum vs a barrier-split unfused version.
                # Past ~4M edges the XLA paths run edge-chunked (the
                # materialized [nnz, N] transient OOMs reddit2 whole).
                a = jnp.asarray(
                    rng.standard_normal((n_nodes, n_feat)).astype(np.float32)
                )
                CH = 1 << 22

                def _chunked(body, s, d2, a, b):
                    nnz_ = s.shape[0]
                    n_c = -(-nnz_ // CH)
                    sp = jnp.pad(s, (0, n_c * CH - nnz_))
                    dp = jnp.pad(d2, (0, n_c * CH - nnz_))

                    def step(carry, c):
                        ss = jax.lax.dynamic_slice_in_dim(sp, c * CH, CH)
                        dd = jax.lax.dynamic_slice_in_dim(dp, c * CH, CH)
                        carry = jax.lax.dynamic_update_slice(
                            carry, body(ss, dd, a, b), (c * CH,)
                        )
                        return carry, None

                    out, _ = jax.lax.scan(
                        step, jnp.zeros(n_c * CH, jnp.float32),
                        jnp.arange(n_c, dtype=jnp.int32),
                    )
                    return out[:nnz_]

                def _fused(s, d2, a, b):
                    return ops.sddmm_coo(s, d2, a, b)

                def _unfused(s, d2, a, b):
                    ga, gb = jax.lax.optimization_barrier((a[d2], b[s]))
                    return jnp.sum(ga * gb, axis=-1)

                big = g.num_edges > 4_000_000
                variants = {
                    "xla_fused": functools.partial(
                        jax.jit(
                            (lambda s, d2, a, b: _chunked(_fused, s, d2, a, b))
                            if big else _fused
                        ),
                        g.src, g.dst,
                    ),
                    "xla_unfused": functools.partial(
                        jax.jit(
                            (lambda s, d2, a, b: _chunked(_unfused, s, d2, a, b))
                            if big else _unfused
                        ),
                        g.src, g.dst,
                    ),
                    "args": (a, x),
                }
                if not big and on_accel:
                    variants["geot_pallas"] = functools.partial(
                        jax.jit(
                            lambda gg, a, b: ops.sddmm_coo(
                                gg.src, gg.dst, a, b, graph=gg,
                                backend="pallas",
                            )
                        ),
                        g,
                    )
            elif args.op == "mh_spmm":
                # multi-head SpMM (GAT aggregation op): features = per-head
                # dim D, heads from --heads; vs the unfused XLA composition
                # (`x[src] * w` segment-summed), the reference's eager
                # pattern (`test/test_mh_spmm.py:4-28`)
                H = args.heads
                D = n_feat
                xh = jnp.asarray(
                    rng.standard_normal((n_nodes, H, D)).astype(np.float32)
                )
                wh = jnp.asarray(
                    rng.standard_normal((g.num_edges, H)).astype(np.float32)
                )

                def _unfused_mh(s, d2, xh, wh):
                    v = xh[s] * wh[:, :, None]
                    return jax.ops.segment_sum(
                        v, d2, num_segments=n_nodes, indices_are_sorted=True
                    )

                variants = {
                    "geot_pallas" if on_accel else "geot_interpret": (
                        functools.partial(
                            jax.jit(
                                lambda gg, xh, wh: ops.mh_spmm(
                                    gg.src, gg.dst, wh, xh, n_nodes,
                                    graph=gg, backend="pallas",
                                )
                            ),
                            g,
                        )
                    ),
                    "xla_unfused": functools.partial(
                        jax.jit(_unfused_mh), g.src, g.dst
                    ),
                    "args": (xh, wh),
                }
            else:  # index_scatter
                idx = jnp.asarray(dst_sorted)
                plan = g.bat if g.bat is not None else g.plan
                variants = {
                    "geot_pallas" if on_accel else "geot_interpret": (
                        functools.partial(
                            jax.jit(
                                lambda pp, d2, v: ops.index_scatter(
                                    v, d2, n_nodes, plan=pp,
                                    backend="pallas",
                                )
                            ),
                            plan, g.dst,
                        )
                    ),
                    "geot_auto": functools.partial(
                        jax.jit(
                            lambda pp, d2, v: ops.index_scatter(
                                v, d2, n_nodes, plan=pp, backend="auto"
                            )
                        ),
                        plan, g.dst,
                    ),
                    "xla_segment_sum": functools.partial(
                        jax.jit(
                            lambda i2, v: jax.ops.segment_sum(
                                v, i2, n_nodes, indices_are_sorted=True
                            )
                        ),
                        idx,
                    ),
                    "xla_scatter_add": functools.partial(
                        jax.jit(
                            lambda i2, v: jnp.zeros(
                                (n_nodes, v.shape[1]), v.dtype
                            )
                            .at[i2]
                            .add(v)
                        ),
                        idx,
                    ),
                    "args": (ev,),
                }
            call_args = variants.pop("args")
            for vname, fn in variants.items():
                try:
                    t = timeit(fn, *call_args, warmup=3, iters=iters)
                except Exception as exc:  # keep sweeping
                    print(f"{name} N={n_feat} {vname}: FAILED {exc}")
                    continue
                if args.op == "sddmm":
                    sol = sddmm_bytes(g.num_edges, n_feat)
                elif args.op == "mh_spmm":
                    sol = spmm_bytes(
                        g.num_edges, args.heads * n_feat, n_nodes, n_nodes
                    ) + 4 * g.num_edges * (args.heads - 1)
                else:
                    sol = spmm_bytes(g.num_edges, n_feat, n_nodes, n_nodes)
                gbps = sol / t / 1e9
                rows.append(
                    dict(
                        dataset=name,
                        op=(
                            f"mh_spmm_h{args.heads}"
                            if args.op == "mh_spmm"
                            else args.op
                        ),
                        variant=vname,
                        features=n_feat,
                        nnz=g.num_edges,
                        time_ms=round(t * 1e3, 4),
                        effective_gbps=round(gbps, 2),
                        # reference GFLOPS convention (codegen.py:10):
                        # nnz*N per op call (N = H*D for multi-head)
                        gflops=round(
                            g.num_edges
                            * n_feat
                            * (args.heads if args.op == "mh_spmm" else 1)
                            / t
                            / 1e9,
                            2,
                        ),
                    )
                )
                print(rows[-1], flush=True)
                if args.out:
                    # incremental append: a dropped TPU tunnel mid-grid
                    # must not lose the measured rows
                    hdr = not os.path.exists(args.out)
                    with open(args.out, "a", newline="") as f:
                        wtr = csv.DictWriter(f, fieldnames=list(rows[-1]))
                        if hdr:
                            wtr.writeheader()
                        wtr.writerow(rows[-1])
    if args.out and rows:
        print(f"wrote {len(rows)} rows to {args.out}")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument(
        "--op",
        choices=["spmm", "spmm_static", "index_scatter", "sddmm", "mh_spmm"],
        default="spmm",
    )
    p.add_argument("--datasets", nargs="+", default=DEFAULT_DATASETS)
    p.add_argument("--features", nargs="+", type=int, default=DEFAULT_FEATURES)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--max-edges", type=int, default=0)
    p.add_argument("--out", default="")
    run(p.parse_args())


if __name__ == "__main__":
    main()
