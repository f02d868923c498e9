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


def select_config(
    n_features: int,
    nnz: int,
    num_segments: int,
    *,
    dtype_bytes: int = 4,
) -> KernelConfig:
    """Pick tile shapes from the op shape (feature_size, size, avg) — the
    same feature triple the reference trees split on."""
    avg = nnz / max(num_segments, 1)
    table = load_table()
    if table:
        k = f"{_bucket(max(n_features,1))}:{_bucket(max(nnz,1))}:{_bucket(max(avg,1.0))}"
        if k in table:
            return table[k]

    if n_features <= 16:
        # PR layout: edges on lanes, features on sublanes.
        e_tile = 512 if avg >= 16 else 256
        return KernelConfig(mode="pr", e_tile=e_tile, s_tile=128, f_tile=128)

    # SR layout. Wider output windows only when segments are dense enough
    # that window-crossing padding stays small.
    if avg >= 32:
        s_tile, e_tile = 256, 512
    elif avg >= 4:
        s_tile, e_tile = 128, 256
    else:
        s_tile, e_tile = 128, 128
    f_tile = 256 if n_features % 256 == 0 and n_features >= 256 else 128
    return KernelConfig(mode="sr", e_tile=e_tile, s_tile=s_tile, f_tile=f_tile)
