"""Offline tile-shape sweep → measured lookup table.

The TPU analogue of GeoT's autotuning pipeline (SURVEY §2.5): where the
reference sweeps CUDA template configs over .npy index datasets
(`benchmark/benchmark_cpp/benchmark_kernel.cu`), filters the argmax-GFLOPS
rows and fits a decision tree codegen'd to C++
(`data/process/dtregression.py:26-343`), this sweeps SegmentPlan tile
shapes on the actual device, correctness-checks each config against the
XLA reference (the analogue of the sweep's per-config check,
`benchmark/benchmark_cpp/include/util.cuh:67-73`), and writes the winners
to a JSON table keyed by log2 buckets of (feature_size, nnz, avg) — the
same feature triple the reference trees split on. `heuristics.select_config`
consults the table before its analytic fallback.

Run:  python -m geot_tpu.tuning.sweep --datasets cora ogbn-arxiv \
          --features 32 64 128 --out geot_tpu/tuning/table.json
"""

from __future__ import annotations

import argparse
import dataclasses
import itertools
import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from geot_tpu.tuning.heuristics import KernelConfig, _bucket

# SR space: edge tile × output window × feature tile; PR space: edge tile ×
# window (feature tile fixed by layout). Mirrors the reference sweep spaces
# (`benchmark/benchmark_cpp/include/codegen.py:25-78`) scaled to TPU tiles.
SR_SPACE = [
    KernelConfig("sr", e, s, f)
    for e, s, f in itertools.product((128, 256, 512), (128, 256, 512), (128, 256))
]
PR_SPACE = [
    KernelConfig("pr", e, s, 128)
    for e, s in itertools.product((128, 256, 512), (128, 256))
]


def measure_config(
    cfg: KernelConfig,
    src: np.ndarray,
    dst: np.ndarray,
    n_nodes: int,
    n_features: int,
    *,
    iters: int = 30,
    check: bool = True,
) -> Optional[float]:
    """Seconds per fused weighted-SpMM call under `cfg`, or None if the
    config fails to build/run or miscompares."""
    import jax
    import jax.numpy as jnp

    from geot_tpu.graph.structures import build_graph
    from geot_tpu.ops import api as ops
    from geot_tpu.ops import reference as ref
    from geot_tpu.utils.timing import timeit

    if cfg.mode == "pr" and n_features > 64:
        return None
    rng = np.random.default_rng(0)
    w = rng.standard_normal(len(src)).astype(np.float32)
    try:
        g = build_graph(
            src, dst, n_nodes, edge_weight=w, e_tile=cfg.e_tile, s_tile=cfg.s_tile
        )
        # force the swept layout through the plan's mode hint
        g = dataclasses.replace(
            g,
            plan=dataclasses.replace(g.plan, mode_hint=cfg.mode),
            plan_t=dataclasses.replace(g.plan_t, mode_hint=cfg.mode),
        )
        x = jnp.asarray(
            rng.standard_normal((n_nodes, n_features)).astype(np.float32)
        )
        import functools

        # graph passed as a jit argument (not a closure constant)
        fn = functools.partial(
            jax.jit(lambda gg, x: ops.segment_spmm(gg, x, backend="pallas")), g
        )
        out = fn(x)
        if check:
            expect = ref.gather_weight_scatter_ref(
                g.src, g.dst, g.edge_weight, x, n_nodes
            )
            m = float(jnp.max(jnp.abs(out - expect)))
            scale = float(jnp.max(jnp.abs(expect))) + 1e-6
            if not np.isfinite(m) or m > 1e-2 * scale + 1e-3:
                return None  # reject miscompiling config (−1 in the reference)
        return timeit(fn, x, warmup=3, iters=iters)
    except Exception:
        return None


def sweep_graph(
    src: np.ndarray,
    dst: np.ndarray,
    n_nodes: int,
    features: List[int],
    *,
    iters: int = 30,
    verbose: bool = True,
    out_path: Optional[str] = None,
) -> Dict[str, Tuple[KernelConfig, float]]:
    """Best config per feature size for one graph. Returns
    {bucket_key: (config, seconds)}."""
    nnz = len(src)
    avg = nnz / max(n_nodes, 1)
    best: Dict[str, Tuple[KernelConfig, float]] = {}
    for n_feat in features:
        space = SR_SPACE + (PR_SPACE if n_feat <= 64 else [])
        k = f"{_bucket(max(n_feat,1))}:{_bucket(max(nnz,1))}:{_bucket(max(avg,1.0))}"
        for cfg in space:
            t = measure_config(cfg, src, dst, n_nodes, n_feat, iters=iters)
            if t is None:
                continue
            if k not in best or t < best[k][1]:
                best[k] = (cfg, t)
            if verbose:
                print(f"N={n_feat} {cfg.key()}: {t*1e3:.3f} ms")
        if verbose and k in best:
            print(f"--> N={n_feat} best: {best[k][0].key()} {best[k][1]*1e3:.3f} ms")
        if out_path and k in best:
            write_table({k: best[k]}, out_path)  # incremental: survive kills
    return best


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


def main() -> None:
    from geot_tpu.graph.datasets import DATASET_SHAPES, synthetic_graph

    p = argparse.ArgumentParser()
    p.add_argument("--datasets", nargs="+", default=["cora", "ogbn-arxiv"])
    p.add_argument("--features", nargs="+", type=int, default=[32, 64, 128])
    p.add_argument("--iters", type=int, default=30)
    p.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(__file__), "table.json"),
    )
    args = p.parse_args()
    merged: Dict[str, Tuple[KernelConfig, float]] = {}
    for name in args.datasets:
        n, e, _, _ = DATASET_SHAPES[name]
        d = synthetic_graph(n, e, power=1.0, seed=0)
        print(f"== {name}: {n} nodes, {e} edges")
        res = sweep_graph(
            d.src, d.dst, n, args.features, iters=args.iters, out_path=args.out
        )
        for k, v in res.items():
            if k not in merged or v[1] < merged[k][1]:
                merged[k] = v
    write_table(merged, args.out)
    print(f"table written to {args.out} ({len(merged)} new/updated keys)")


if __name__ == "__main__":
    main()
