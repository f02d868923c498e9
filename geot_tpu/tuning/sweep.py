"""Offline tile-shape sweep → measured lookup table + tuning artifacts.

The TPU analogue of GeoT's autotuning pipeline (SURVEY §2.5): where the
reference sweeps CUDA template configs over .npy index datasets
(`benchmark/benchmark_cpp/benchmark_kernel.cu`), filters the argmax-GFLOPS
rows and fits a decision tree codegen'd to C++
(`data/process/dtregression.py:26-343`), this sweeps Pallas tile
shapes on the actual device, correctness-checks each config against the
XLA reference (the analogue of the sweep's per-config check,
`benchmark/benchmark_cpp/include/util.cuh:67-73`), and writes the winners
to a JSON table keyed by `op:` + log2 buckets of (feature_size, nnz, avg)
— the same feature triple the reference trees split on, with one table
family per op (`spmm` static weights / `spmm_dyn` per-call weights /
`index_scatter`). `heuristics.select_config` consults the table before its
analytic fallback.

One sweep run also emits the reference's tuning-validation artifacts:
  - results/tuning_ablation.csv — table-selected vs exhaustive-best vs
    analytic-heuristic time per (graph, op, N): the exp2 rule-quality
    ablation (`artifact/exp2/query_rule.py:30-50`).
  - results/config_sensitivity.csv — per-config times over the
    (mode, e_tile, s_tile) grid: the exp6 sensitivity heatmap data
    (`artifact/exp6/heatmap.py:7-24`).

Index-distribution augmentation (`tuning.augment`, the analogue of
`data/augment_dataset.py`) widens bucket coverage via --augment.

Run:  python -m geot_tpu.tuning.sweep --datasets pubmed ogbn-arxiv \
          --features 32 128 --augment --out geot_tpu/tuning/table.json
"""

from __future__ import annotations

import argparse
import dataclasses
import itertools
import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from geot_tpu.tuning.heuristics import KernelConfig, bucket_key, select_config

OPS = ("spmm", "spmm_dyn", "index_scatter")


def config_space(
    op: str, n_features: int, fast: bool = False
) -> List[KernelConfig]:
    """Candidate tile configs for one op family at one feature size.

    BAT (block-aligned tiles, v3 kernels) is the production layout; the
    packed variant places 128//N edge groups per lane row for narrow
    features. A small legacy slot-SR slice stays in the space as a
    cross-check (it also exercises the fallback path the sweep table can
    still select). Mirrors the reference sweep spaces
    (`benchmark/benchmark_cpp/include/codegen.py:25-78`) scaled to TPU
    tiles.
    """
    if fast:
        # trimmed space for wall-clock-bounded re-sweeps: the historically
        # winning configs + one representative per family + xla/hybrid.
        # (Graph build + compile dominate per-config cost, so the sweep
        # scales with |space|, not iters.)
        space = [
            KernelConfig("bat", 1024, 256, 128),
            KernelConfig("bat", 512, 256, 128),
            KernelConfig("bat", 1024, 128, 128),
        ]
        if n_features <= 64:
            space += [
                KernelConfig("bat_packed", 512, 256, 128),
                KernelConfig("bat_packed", 256, 256, 128),
            ]
        space += [KernelConfig("sr", 512, 256, 128)]
    else:
        space = [
            KernelConfig("bat", e, s, 128)
            for e, s in itertools.product((512, 1024), (128, 256))
        ]
        if n_features <= 64:
            space += [
                KernelConfig("bat_packed", e, s, 128)
                for e, s in itertools.product((256, 512, 1024), (128, 256))
            ]
        space += [
            KernelConfig("sr", e, s, 128)
            for e, s in itertools.product((256, 512), (128, 256))
        ]
    # the plain XLA path is a first-class candidate: the rule table must be
    # able to record the NON-custom implementation where it wins (the
    # latency floor at cora/citeseer scale — round-3 grid showed measured
    # Pallas winners losing to XLA there because XLA wasn't in the space)
    space.append(KernelConfig("xla"))
    # the hybrid stream+gather path is a candidate for wide-feature static
    # spmm (the only shape the streaming kernel serves): its measurement
    # reconciles the census gate with the table — the sweep writes a
    # 'spmm_hyb:<bucket>' verdict key that graph build consults to endorse
    # or veto the census decision on swept shapes (VERDICT r4 Next #7).
    # On graphs whose census rejects streaming the candidate is simply
    # inapplicable (measure_config returns None).
    if op == "spmm" and n_features > 64:
        space.append(KernelConfig("hybrid"))
    return space


def _build_for_config(
    cfg: KernelConfig,
    src: np.ndarray,
    dst: np.ndarray,
    n_nodes: int,
    n_features: int,
    w: Optional[np.ndarray],
):
    """Graph forced onto cfg's layout. BAT modes pin the BatPlan tiles
    (packed iff the mode says so); legacy 'sr' drops the BAT plans so the
    dispatcher takes the slot path."""
    from geot_tpu.graph.structures import build_graph

    if cfg.mode == "hybrid":
        g = build_graph(
            src, dst, n_nodes, edge_weight=w,
            feature_hint=n_features, layouts=("bat", "stream"),
        )
        # census rejected streaming: the candidate is inapplicable on this
        # graph (the caller records no row — parity with a config that
        # fails its correctness check)
        return g if g.hyb is not None else None
    if cfg.mode in ("bat", "bat_packed"):
        hint = n_features if cfg.mode == "bat_packed" else 128
        return build_graph(
            src, dst, n_nodes, edge_weight=w,
            e_tile=512, s_tile=256,
            bat_e_tile=cfg.e_tile, bat_s_tile=cfg.s_tile,
            feature_hint=hint,
        )
    g = build_graph(
        src, dst, n_nodes, edge_weight=w,
        e_tile=cfg.e_tile, s_tile=cfg.s_tile, feature_hint=n_features,
    )
    return dataclasses.replace(g, bat=None, bat_t=None)


def measure_config(
    cfg: KernelConfig,
    src: np.ndarray,
    dst: np.ndarray,
    n_nodes: int,
    n_features: int,
    *,
    op: str = "spmm",
    iters: int = 30,
    check: bool = True,
) -> Optional[float]:
    """Seconds per call for `op` under `cfg`, or None if the config fails
    to build/run or miscompares (the −1 of the reference's per-config
    check)."""
    import functools

    import jax
    import jax.numpy as jnp

    from geot_tpu.ops import api as ops
    from geot_tpu.ops import reference as ref
    from geot_tpu.utils.timing import timeit

    if cfg.mode == "bat_packed" and n_features > 64:
        return None
    if cfg.mode == "hybrid" and (op != "spmm" or n_features <= 64):
        return None  # streaming serves wide-feature static spmm only
    if cfg.mode == "pr":
        return None  # retired layout (round-1: 4x slower than packed)
    if cfg.mode in ("sr", "packed") and len(src) > 20_000_000:
        return None  # slot plans at this scale: ~3 GB HBM + minutes of build
    rng = np.random.default_rng(0)
    w = rng.standard_normal(len(src)).astype(np.float32)
    if cfg.mode == "xla":
        # reference-path candidate: no plan to build, no check (it IS the
        # oracle the other configs are checked against)
        try:
            x = jnp.asarray(
                rng.standard_normal((n_nodes, n_features)).astype(np.float32)
            )
            if op in ("spmm", "spmm_dyn"):
                srcj, dstj = jnp.asarray(src), jnp.asarray(dst)
                wj = jnp.asarray(w)
                fn = jax.jit(
                    lambda x, w: ref.gather_weight_scatter_ref(
                        srcj, dstj, w, x, n_nodes
                    )
                )
                args = (x, wj)
            else:
                idx = jnp.asarray(np.sort(np.asarray(dst)))
                vals = jnp.asarray(
                    rng.standard_normal((len(src), n_features)).astype(
                        np.float32
                    )
                )
                fn = jax.jit(
                    lambda v: jax.ops.segment_sum(
                        v, idx, n_nodes, indices_are_sorted=True
                    )
                )
                args = (vals,)
            return timeit(fn, *args, warmup=3, iters=iters)
        except Exception:
            if os.environ.get("GEOT_SWEEP_DEBUG"):
                import traceback

                traceback.print_exc()
            return None
    try:
        g = _build_for_config(
            cfg, src, dst, n_nodes, n_features,
            w if op == "spmm" else None,
        )
        if g is None:
            return None
        x = jnp.asarray(
            rng.standard_normal((n_nodes, n_features)).astype(np.float32)
        )
        if op == "spmm":
            fn = functools.partial(
                jax.jit(
                    lambda gg, x: ops.segment_spmm(gg, x, backend="pallas")
                ),
                g,
            )
            args = (x,)
        elif op == "spmm_dyn":
            wj = jnp.asarray(w)
            fn = functools.partial(
                jax.jit(
                    lambda gg, x, w: ops.segment_spmm(
                        gg, x, w, backend="pallas"
                    )
                ),
                g,
            )
            args = (x, wj)
        elif op == "index_scatter":
            # vals in (dst-sorted) edge order — the op's own input order
            vals = jnp.asarray(
                rng.standard_normal((len(g.src), n_features)).astype(
                    np.float32
                )
            )
            plan = g.bat if g.bat is not None else g.plan
            fn = functools.partial(
                jax.jit(
                    lambda pp, dd, v: ops.index_scatter(
                        v, dd, n_nodes, plan=pp, backend="pallas"
                    )
                ),
                plan,
                g.dst,
            )
            args = (vals,)
        else:
            raise ValueError(op)
        out = fn(*args)
        if check and len(src) > 5_000_000:
            # large graphs: the XLA oracle materializes [nnz, N] (11.9 GB
            # at reddit2) and OOMs the chip — verify a random row subset
            # against a host oracle instead
            rows = np.random.default_rng(7).integers(0, n_nodes, 128)
            d_h = np.asarray(g.dst)
            s_h = np.asarray(g.src)
            sel = np.isin(d_h, rows)
            if op == "spmm":
                w_h = np.asarray(g.edge_weight)[sel]
            elif op == "spmm_dyn":
                w_h = np.asarray(args[1])[sel]
            else:
                w_h = np.ones(int(sel.sum()), np.float32)
            v_h = np.asarray(args[-1] if op == "index_scatter" else args[0])
            base = v_h[s_h[sel]] if op != "index_scatter" else v_h[
                np.nonzero(sel)[0]
            ]
            expect = np.zeros((n_nodes, v_h.shape[1]), np.float64)
            np.add.at(expect, d_h[sel], base * w_h[:, None])
            got = np.asarray(out)[rows]
            want = expect[rows]
            m = float(np.max(np.abs(got - want)))
            scale = float(np.max(np.abs(want))) + 1e-6
            if not np.isfinite(m) or m > 1e-2 * scale + 1e-3:
                return None
        elif check:
            if op == "spmm":
                expect = ref.gather_weight_scatter_ref(
                    g.src, g.dst, g.edge_weight, x, n_nodes
                )
            elif op == "spmm_dyn":
                expect = ref.gather_weight_scatter_ref(
                    g.src, g.dst, args[1], x, n_nodes
                )
            else:
                expect = ref.segment_reduce_ref(args[0], g.dst, n_nodes, "sum")
            m = float(jnp.max(jnp.abs(out - expect)))
            scale = float(jnp.max(jnp.abs(expect))) + 1e-6
            if not np.isfinite(m) or m > 1e-2 * scale + 1e-3:
                return None
        return timeit(fn, *args, warmup=3, iters=iters)
    except Exception:
        if os.environ.get("GEOT_SWEEP_DEBUG"):
            import traceback

            traceback.print_exc()
        return None


@dataclasses.dataclass
class SweepRow:
    dataset: str
    op: str
    n_features: int
    cfg: KernelConfig
    seconds: float
    nnz: int = 0
    n_nodes: int = 0


def sweep_graph(
    name: str,
    src: np.ndarray,
    dst: np.ndarray,
    n_nodes: int,
    features: List[int],
    *,
    ops: Tuple[str, ...] = OPS,
    iters: int = 30,
    verbose: bool = True,
    out_path: Optional[str] = None,
    fast: bool = False,
) -> Tuple[Dict[str, Tuple[KernelConfig, float]], List[SweepRow]]:
    """Best config per (op, bucket) for one graph + every measured row.
    Returns ({table_key: (config, seconds)}, rows)."""
    nnz = len(src)
    best: Dict[str, Tuple[KernelConfig, float]] = {}
    rows: List[SweepRow] = []
    for op in ops:
        for n_feat in features:
            kb = f"{op}:{bucket_key(n_feat, nnz, n_nodes)}"
            for cfg in config_space(op, n_feat, fast=fast):
                t = measure_config(
                    cfg, src, dst, n_nodes, n_feat, op=op, iters=iters
                )
                if t is None:
                    continue
                rows.append(SweepRow(name, op, n_feat, cfg, t, nnz, n_nodes))
                if kb not in best or t < best[kb][1]:
                    best[kb] = (cfg, t)
                if verbose:
                    print(f"{name} {op} N={n_feat} {cfg.key()}: {t*1e3:.3f} ms",
                          flush=True)
            # noise-floor tie-break: sub-3ms cells sit at the tunnel-RTT
            # noise scale where sweep-vs-grid reruns flip marginal winners
            # (r5 grid: citeseer N=32 'sr' won the sweep by 4% then lost
            # the grid by 46%). Inside that regime a custom config must
            # beat xla by >20% to displace it — otherwise record xla (the
            # robust choice; it is also what the latency floor would pick).
            cell = [
                r for r in rows
                if r.dataset == name and r.op == op and r.n_features == n_feat
            ]
            xla_rows = [r for r in cell if r.cfg.mode == "xla"]
            if (
                xla_rows
                and kb in best
                and best[kb][0].mode != "xla"
                and xla_rows[0].seconds < 3e-3
                and best[kb][1] > 0.8 * xla_rows[0].seconds
            ):
                best[kb] = (xla_rows[0].cfg, xla_rows[0].seconds)
            if verbose and kb in best:
                print(
                    f"--> {name} {op} N={n_feat} best: "
                    f"{best[kb][0].key()} {best[kb][1]*1e3:.3f} ms",
                    flush=True,
                )
            # census-gate reconciliation (VERDICT r4 Next #7): when the
            # hybrid candidate was MEASURED at this key (census accepted a
            # stream split on this graph), record the verdict under a
            # companion key — graph build endorses/vetoes the census gate
            # from it (`structures.build_graph`). A key without a measured
            # hybrid row stays silent: the census remains the decider.
            hyb_measured = any(
                r.cfg.mode == "hybrid"
                and r.op == op
                and r.n_features == n_feat
                and r.dataset == name
                for r in rows
            )
            if op == "spmm" and hyb_measured and kb in best:
                best[f"spmm_hyb:{kb.split(':', 1)[1]}"] = best[kb]
            if out_path and kb in best:
                hk = f"spmm_hyb:{kb.split(':', 1)[1]}"
                payload = {kb: best[kb]}
                if hk in best:
                    payload[hk] = best[hk]
                write_table(payload, out_path)  # survive kills
    return best, rows


def write_table(
    results: Dict[str, Tuple[KernelConfig, float]], path: str
) -> None:
    """Merge winners into the JSON lookup table (keeps existing keys)."""
    table = {}
    if os.path.exists(path):
        with open(path) as f:
            table = json.load(f)
    for k, (cfg, _) in results.items():
        table[k] = dict(
            mode=cfg.mode, e_tile=cfg.e_tile, s_tile=cfg.s_tile, f_tile=cfg.f_tile
        )
    with open(path, "w") as f:
        json.dump(table, f, indent=1, sort_keys=True)


def write_artifacts(rows: List[SweepRow], results_dir: str) -> None:
    """Emit the exp2-style rule-quality ablation and the exp6-style
    config-sensitivity data from the sweep's measurements."""
    os.makedirs(results_dir, exist_ok=True)
    sens = os.path.join(results_dir, "config_sensitivity.csv")
    new = not os.path.exists(sens)
    with open(sens, "a") as f:
        if new:
            f.write("dataset,op,n_features,mode,e_tile,s_tile,f_tile,ms\n")
        for r in rows:
            f.write(
                f"{r.dataset},{r.op},{r.n_features},{r.cfg.mode},"
                f"{r.cfg.e_tile},{r.cfg.s_tile},{r.cfg.f_tile},"
                f"{r.seconds*1e3:.4f}\n"
            )
    # ablation: heuristic pick vs exhaustive best vs worst, per (graph,op,N)
    abl = os.path.join(results_dir, "tuning_ablation.csv")
    new = not os.path.exists(abl)
    groups: Dict[Tuple[str, str, int], List[SweepRow]] = {}
    for r in rows:
        groups.setdefault((r.dataset, r.op, r.n_features), []).append(r)
    with open(abl, "a") as f:
        if new:
            f.write(
                "dataset,op,n_features,best_cfg,best_ms,heuristic_cfg,"
                "heuristic_ms,worst_ms,heuristic_vs_best\n"
            )
        import geot_tpu.tuning.heuristics as H

        for (ds, op, nf), rs in groups.items():
            rs.sort(key=lambda r: r.seconds)
            bestr, worst = rs[0], rs[-1]
            # analytic heuristic = select_config with an EMPTY table (the
            # naive-rule arm of the reference ablation,
            # `csrc/cuda/wrapper/index_scatter_rule_naive.h:4-41`)
            cache, H._table_cache = H._table_cache, {}
            try:
                hcfg = select_config(nf, rs[0].nnz, rs[0].n_nodes, op=op)
            finally:
                H._table_cache = cache
            hrow = min(
                (r for r in rs if r.cfg == hcfg),
                default=bestr,
                key=lambda r: r.seconds,
            )
            f.write(
                f"{ds},{op},{nf},{bestr.cfg.key()},{bestr.seconds*1e3:.4f},"
                f"{hcfg.key()},{hrow.seconds*1e3:.4f},"
                f"{worst.seconds*1e3:.4f},"
                f"{hrow.seconds/max(bestr.seconds,1e-12):.4f}\n"
            )


def main() -> None:
    from geot_tpu.graph.datasets import DATASET_SHAPES, synthetic_graph
    from geot_tpu.tuning.augment import augment_sorted_index

    p = argparse.ArgumentParser()
    p.add_argument("--datasets", nargs="+", default=["pubmed", "ogbn-arxiv"])
    p.add_argument("--features", nargs="+", type=int, default=[32, 128])
    p.add_argument("--ops", nargs="+", default=list(OPS))
    p.add_argument("--iters", type=int, default=30)
    p.add_argument(
        "--fast", action="store_true",
        help="trimmed config space (historical winners + xla/hybrid)",
    )
    p.add_argument(
        "--augment",
        action="store_true",
        help="also sweep index augmentations (index_scatter family) — the "
        "reference's training-data augmentation (`data/augment_dataset.py`)",
    )
    p.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(__file__), "table.json"),
    )
    p.add_argument("--results-dir", default="results")
    args = p.parse_args()
    merged: Dict[str, Tuple[KernelConfig, float]] = {}
    all_rows: List[SweepRow] = []
    for name in args.datasets:
        if name.startswith("rmat-s"):
            from geot_tpu.graph.datasets import rmat_graph

            d = rmat_graph(int(name[len("rmat-s"):]))
            n = d.num_nodes
        elif name.endswith("-clustered"):
            from geot_tpu.graph.datasets import synthetic_clustered_graph

            n, e, _, _ = DATASET_SHAPES[name.removesuffix("-clustered")]
            d = synthetic_clustered_graph(
                n, e, mixing=0.3, mean_community=2000, power=1.0, seed=0
            )
        else:
            n, e, _, _ = DATASET_SHAPES[name]
            d = synthetic_graph(n, e, power=1.0, seed=0)
        print(f"== {name}: {n} nodes, {d.num_edges} edges", flush=True)
        res, rows = sweep_graph(
            name, d.src, d.dst, n, args.features,
            ops=tuple(args.ops), iters=args.iters, out_path=args.out,
            fast=args.fast,
        )
        all_rows += rows
        for k, v in res.items():
            if k not in merged or v[1] < merged[k][1]:
                merged[k] = v
        if args.augment and "index_scatter" in args.ops:
            rng = np.random.default_rng(1)
            dst_sorted = np.sort(d.dst)
            for tag, idx in augment_sorted_index(dst_sorted):
                aname = f"{name}+{tag}"
                asrc = rng.integers(0, n, len(idx)).astype(np.int32)
                print(f"== {aname}: {len(idx)} edges", flush=True)
                res, rows = sweep_graph(
                    aname, asrc, idx.astype(np.int32), n, args.features,
                    ops=("index_scatter",), iters=args.iters,
                    out_path=args.out,
                )
                all_rows += rows
                for k, v in res.items():
                    if k not in merged or v[1] < merged[k][1]:
                        merged[k] = v
    write_table(merged, args.out)
    write_artifacts(all_rows, args.results_dir)
    print(
        f"table written to {args.out} ({len(merged)} new/updated keys); "
        f"artifacts in {args.results_dir}/",
        flush=True,
    )


if __name__ == "__main__":
    main()
