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

__all__ = ["KernelConfig", "select_config", "load_table", "TABLE_ENV"]

TABLE_ENV = "GEOT_TPU_TUNING_TABLE"


@dataclasses.dataclass(frozen=True)
class KernelConfig:
    mode: str  # 'sr' | 'pr'
    e_tile: int = 256
    s_tile: int = 128
    f_tile: int = 128

    def key(self) -> str:
        return f"{self.mode}:{self.e_tile}:{self.s_tile}:{self.f_tile}"


_table_cache: Optional[dict] = None


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
    table keys are op-prefixed, with un-prefixed legacy keys as fallback.

    For mode 'bat'/'bat_packed' the tiles are the BatPlan tiles (v3
    kernels); 'sr'/'packed' are the legacy slot-layout tiles. 'pr' is never
    recommended: the PR layout measured ~4x slower on TPU than packed-SR
    (round-1 RESULTS) and `_pick_mode` treats it as opt-in only.
    """
    avg = nnz / max(num_segments, 1)
    table = load_table()
    if table:
        kb = bucket_key(n_features, nnz, num_segments)
        for key in (f"{op}:{kb}", kb):
            if key in table:
                return table[key]

    if n_features <= 64:
        # packed BAT: 128//n lanes per edge row; measured best for narrow
        # features (bat/packed sweeps, round 2)
        return KernelConfig(mode="bat_packed", e_tile=512, s_tile=256)
    # wide features: BAT with big edge blocks; narrow output windows only
    # when segments are sparse (window-coverage tiles stay cheap)
    s_tile = 256 if avg >= 8 else 128
    return KernelConfig(mode="bat", e_tile=1024, s_tile=s_tile, f_tile=128)
