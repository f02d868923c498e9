"""Kernel-config selection: the TPU analogue of GeoT's decision-tree rules.

GeoT dispatches over (feature_size, nnz, avg = nnz/keys) through offline-
trained depth-5 decision trees codegen'd into C++ headers
(`csrc/cuda/wrapper/index_scatter_rule.h:3-256`, trainer
`data/process/dtregression.py:26-343`). Here the tunables are the Pallas
tile shapes (edge tile, output window, feature tile) and the SR/PR layout
split. Selection order:
  1. a measured lookup table (produced by `geot_tpu.tuning.sweep`, shipped
     as JSON — the analogue of the codegen'd rule headers), else
  2. the analytic heuristic below (analogue of the hand-written fallback
     `csrc/cuda/wrapper/index_scatter_rule_naive.h:4-41`).

Heuristic reasoning (see SURVEY §7): the one-hot matmul costs ~s_tile/2
MXU-flops per value byte, so s_tile is capped near the compute/bandwidth
balance point; e_tile trades window-crossing padding (~e_tile/2 wasted
slots per window) against grid overhead; PR layout (edges on lanes) only
pays off for very narrow features.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

__all__ = [
    "KernelConfig",
    "select_config",
    "select_config_ex",
    "load_table",
    "TABLE_ENV",
]

TABLE_ENV = "GEOT_TPU_TUNING_TABLE"


@dataclasses.dataclass(frozen=True)
class KernelConfig:
    # 'bat' | 'bat_packed' | 'sr' | 'packed' | 'pr' | 'xla'
    # 'xla' = the plain XLA reference path (segment_sum): below a latency
    # floor the Pallas grids lose to XLA's fused scatter (r2 grid: cora all
    # N, citeseer N>=64) — the reference's rule trees exist to make exactly
    # this kind of per-(size, N) implementation choice
    # (`csrc/cuda/wrapper/index_scatter_rule.h:3-256`).
    mode: str
    e_tile: int = 256
    s_tile: int = 128
    f_tile: int = 128

    def key(self) -> str:
        return f"{self.mode}:{self.e_tile}:{self.s_tile}:{self.f_tile}"


_table_cache: Optional[dict] = None


def table_fingerprint() -> str:
    """Short content hash of the active tuning table — cache keys for
    artifacts derived from table decisions (prebuilt graph plans) must
    change when the table does, or a re-sweep keeps serving stale plans
    (campaign r5: a pre-fix packed BAT plan survived two re-sweeps in the
    graph cache and cost collab N=8 a 1.8x loss)."""
    import hashlib

    path = os.environ.get(TABLE_ENV) or os.path.join(
        os.path.dirname(__file__), "table.json"
    )
    if not os.path.exists(path):
        return "notable"
    with open(path, "rb") as f:
        return hashlib.md5(f.read()).hexdigest()[:10]


def load_table(path: Optional[str] = None) -> dict:
    global _table_cache
    if _table_cache is not None and path is None:
        return _table_cache
    path = path or os.environ.get(TABLE_ENV) or os.path.join(
        os.path.dirname(__file__), "table.json"
    )
    table = {}
    if os.path.exists(path):
        with open(path) as f:
            raw = json.load(f)
        for k, v in raw.items():
            table[k] = KernelConfig(**v)
    _table_cache = table
    return table


def _bucket(x: float) -> int:
    """log2 bucket, matching the power-of-two rounding GeoT's tree trainer
    applies to leaf configs (`data/process/dtregression.py`)."""
    b = 0
    while (1 << (b + 1)) <= x:
        b += 1
    return b


def bucket_key(n_features: int, nnz: int, num_segments: int) -> str:
    avg = nnz / max(num_segments, 1)
    return (
        f"{_bucket(max(n_features, 1))}:{_bucket(max(nnz, 1))}:"
        f"{_bucket(max(avg, 1.0))}"
    )


def _nearest_key(table: dict, op: str, kb: str) -> Optional["KernelConfig"]:
    """Shape-interpolating fallback: nearest measured bucket of the SAME op
    family by weighted L1 distance in (log2-feature, log2-nnz, log2-avg)
    space. The reference closes the same gap by *fitting* a regressor over
    its sweep rows (`data/process/dtregression.py:26-343`); with log2
    bucket keys, nearest-bucket lookup is the table-native equivalent —
    measured winners vary smoothly along all three axes, so the nearest
    swept shape beats the analytic fallback (which the round-2 ablation
    put at geomean 1.37x, worst 2.6x, off best)."""
    want = [int(t) for t in kb.split(":")]
    best = None
    prefix = op + ":"
    for key in table:
        if not key.startswith(prefix):
            continue
        have = [int(t) for t in key[len(prefix):].split(":")]
        # feature-size mismatch weighs double: it flips the packed/wide
        # layout family, the costliest wrong call
        d = 2 * abs(have[0] - want[0]) + abs(have[1] - want[1]) + abs(
            have[2] - want[2]
        )
        if best is None or d < best[0]:
            best = (d, table[key])
    return best[1] if best is not None else None


def select_config_ex(
    n_features: int,
    nnz: int,
    num_segments: int,
    *,
    op: str = "spmm",
    dtype_bytes: int = 4,
) -> tuple:
    """`select_config` plus provenance: returns (config, source) with source
    in {'table' (exact measured key), 'floor' (latency-floor rule), 'near'
    (nearest-bucket interpolation), 'heuristic' (analytic fallback)}.
    Callers that reconcile the measured table against other selection
    mechanisms (the stream census gate) need to know whether the pick is a
    measurement or a guess."""
    avg = nnz / max(num_segments, 1)
    table = load_table()
    kb = bucket_key(n_features, nnz, num_segments) if table else ""
    if table and f"{op}:{kb}" in table:
        return table[f"{op}:{kb}"], "table"

    if nnz < 12_000:
        # latency floor: tiny grids lose to XLA's fused scatter (measured,
        # round-2 op grid: cora/citeseer) — route auto dispatch to the
        # reference backend. Checked BEFORE nearest-bucket interpolation:
        # extrapolating a large-graph winner down to a tiny shape is the
        # one regime where the nearest measured bucket is reliably wrong.
        return KernelConfig(mode="xla"), "floor"

    if table:
        near = _nearest_key(table, op, kb)
        if near is not None:
            if nnz > 20_000_000 and near.mode in ("sr", "packed", "pr"):
                # slot layouts are never MEASURED past 20M edges (the sweep
                # skips them: ~3 GB HBM of slot arrays + minutes of host
                # build), so an interpolated slot winner here is an
                # extrapolation outside its measurement domain — and it
                # routed reddit2 models onto a 3x-slower path (campaign r5
                # models stage). Clamp to BAT with the same tiles.
                near = KernelConfig(
                    mode="bat", e_tile=near.e_tile, s_tile=near.s_tile,
                    f_tile=near.f_tile,
                )
            return near, "near"
    if n_features <= 64:
        # packed BAT: 128//n lanes per edge row; measured best for narrow
        # features (bat/packed sweeps, round 2)
        return KernelConfig(mode="bat_packed", e_tile=512, s_tile=256), "heuristic"
    # wide features: BAT with big edge blocks; narrow output windows only
    # when segments are sparse (window-coverage tiles stay cheap)
    s_tile = 256 if avg >= 8 else 128
    return (
        KernelConfig(mode="bat", e_tile=1024, s_tile=s_tile, f_tile=128),
        "heuristic",
    )


def select_config(
    n_features: int,
    nnz: int,
    num_segments: int,
    *,
    op: str = "spmm",
    dtype_bytes: int = 4,
) -> KernelConfig:
    """Pick tile shapes from the op shape (feature_size, size, avg) — the
    same feature triple the reference trees split on. `op` selects the
    table family ('spmm' | 'spmm_dyn' | 'index_scatter'); the measured
    table keys are op-prefixed. Unswept shapes interpolate to the nearest
    measured bucket of the same family (`_nearest_key`); only a family
    with zero measured keys reaches the analytic heuristic.

    For mode 'bat'/'bat_packed' the tiles are the BatPlan tiles (v3
    kernels); 'sr'/'packed' are the legacy slot-layout tiles. 'pr' is never
    recommended: the PR layout measured ~4x slower on TPU than packed-SR
    (round-1 RESULTS) and `_pick_mode` treats it as opt-in only.
    """
    return select_config_ex(
        n_features, nnz, num_segments, op=op, dtype_bytes=dtype_bytes
    )[0]
