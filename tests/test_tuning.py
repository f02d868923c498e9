"""Tuning layer: heuristics, table lookup, augmentation, sweep plumbing."""

import json
import os

import numpy as np

import geot_tpu.tuning.heuristics as H
from geot_tpu.tuning.augment import augment_sorted_index, noise_augment, scale_augment
from geot_tpu.tuning.heuristics import KernelConfig, select_config
from geot_tpu.tuning.sweep import measure_config, write_table


def test_select_config_heuristic_shapes(monkeypatch):
    # isolate from the shipped measured table: heuristics only
    monkeypatch.setenv(H.TABLE_ENV, "/nonexistent/table.json")
    H._table_cache = None
    # narrow features: packed BAT (PR retired — measured 4x slower on TPU)
    cfg = select_config(8, 100_000, 10_000)
    assert cfg.mode == "bat_packed"
    cfg = select_config(128, 1_000_000, 10_000)  # avg 100
    assert cfg.mode == "bat" and cfg.e_tile >= 512
    # below the measured latency floor (cora/citeseer, r2 grid): route
    # auto dispatch to the XLA reference path
    cfg = select_config(128, 10_000, 9_000)
    assert cfg.mode == "xla"
    H._table_cache = None


def test_op_prefixed_table_keys(tmp_path, monkeypatch):
    """Measured keys are op-scoped; unswept shapes interpolate to the
    nearest measured bucket of the SAME family, never across families."""
    path = str(tmp_path / "table.json")
    kb = H.bucket_key(64, 500_000, 50_000)
    write_table(
        {
            f"index_scatter:{kb}": (KernelConfig("bat", 512, 128, 128), 1.0),
            f"spmm:{kb}": (KernelConfig("bat", 1024, 256, 128), 1.0),
        },
        path,
    )
    monkeypatch.setenv(H.TABLE_ENV, path)
    H._table_cache = None
    cfg = select_config(64, 500_000, 50_000, op="index_scatter")
    assert (cfg.e_tile, cfg.s_tile) == (512, 128)
    cfg = select_config(64, 500_000, 50_000, op="spmm")
    assert (cfg.e_tile, cfg.s_tile) == (1024, 256)
    # nearest-bucket interpolation: a nearby unswept shape reuses the same
    # family's measured winner instead of the analytic fallback
    cfg = select_config(64, 2_000_000, 80_000, op="spmm")
    assert (cfg.e_tile, cfg.s_tile) == (1024, 256)
    # a family with no measured keys falls through to the heuristic
    cfg = select_config(64, 500_000, 50_000, op="spmm_dyn")
    assert cfg.mode == "bat_packed"
    H._table_cache = None


def test_table_lookup_roundtrip(tmp_path, monkeypatch):
    path = str(tmp_path / "table.json")
    k = "spmm:" + f"{H._bucket(64)}:{H._bucket(500_000)}:{H._bucket(10)}"
    write_table({k: (KernelConfig("sr", 512, 256, 256), 1.0)}, path)
    assert os.path.exists(path)
    monkeypatch.setenv(H.TABLE_ENV, path)
    H._table_cache = None
    cfg = select_config(64, 500_000, 50_000)
    assert (cfg.e_tile, cfg.s_tile, cfg.f_tile) == (512, 256, 256)
    H._table_cache = None


def test_augmentations_preserve_sortedness():
    idx = np.sort(np.random.default_rng(0).integers(0, 50, 400))
    for name, a in augment_sorted_index(idx):
        assert (np.diff(a) >= 0).all(), name
    assert len(noise_augment(idx)) == 5
    lens = [len(a) for a in scale_augment(idx)]
    assert lens == [100, 200, 800, 1600]


def test_measure_config_interpret_smoke():
    """measure_config runs (interpret mode on CPU) and rejects nothing on a
    valid config."""
    rng = np.random.default_rng(0)
    src = rng.integers(0, 60, 300).astype(np.int32)
    dst = rng.integers(0, 60, 300).astype(np.int32)
    t = measure_config(
        KernelConfig("sr", 64, 64, 128), src, dst, 60, 16, iters=2
    )
    assert t is not None and t > 0
