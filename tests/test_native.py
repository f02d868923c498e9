"""Native C++ runtime vs numpy reference implementations."""

import os

import numpy as np
import pytest

from geot_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _numpy_plan(dst, src, num_segments, e_tile, s_tile):
    """Force the numpy path by monkey-free direct construction."""
    import geot_tpu.graph.plan as planmod

    orig = native.build_plan_arrays
    try:
        native.build_plan_arrays = lambda *a, **k: None
        return planmod.build_segment_plan(
            dst, src, num_segments, e_tile=e_tile, s_tile=s_tile
        )
    finally:
        native.build_plan_arrays = orig


def test_plan_native_equals_numpy():
    rng = np.random.default_rng(0)
    for n, e, et, st in [(100, 700, 64, 64), (257, 1301, 128, 256), (50, 0, 32, 32)]:
        dst = np.sort(rng.integers(0, n, e).astype(np.int32))
        src = rng.integers(0, n, e).astype(np.int32)
        import geot_tpu.graph.plan as planmod

        p_nat = planmod.build_segment_plan(dst, src, n, e_tile=et, s_tile=st)
        p_np = _numpy_plan(dst, src, n, et, st)
        for f in ("src_slots", "dst_slots", "edge_pos", "mask", "out_block"):
            np.testing.assert_array_equal(
                np.asarray(getattr(p_nat, f)), np.asarray(getattr(p_np, f)), err_msg=f
            )


def test_sort_by_key_stable():
    rng = np.random.default_rng(1)
    key = rng.integers(0, 37, 5000).astype(np.int32)
    perm = native.sort_by_key(key, 37)
    assert perm is not None
    expect = np.argsort(key, kind="stable")
    np.testing.assert_array_equal(perm, expect.astype(np.int32))


def test_sort_rejects_out_of_range():
    key = np.array([0, 5, 2], np.int32)
    assert native.sort_by_key(key, 3) is None


def test_mtx_round_trip(tmp_path):
    p = str(tmp_path / "t.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write("% comment\n4 4 5\n")
        f.write("1 2 1.5\n2 1 -2.0\n3 3 0.5\n4 1 7.0\n4 4 1.0\n")
    out = native.read_mtx(p)
    assert out is not None
    row, col, val, nr, nc = out
    assert (nr, nc) == (4, 4)
    np.testing.assert_array_equal(row, [0, 1, 2, 3, 3])
    np.testing.assert_array_equal(col, [1, 0, 2, 0, 3])
    np.testing.assert_allclose(val, [1.5, -2.0, 0.5, 7.0, 1.0])


def test_mtx_symmetric_pattern(tmp_path):
    p = str(tmp_path / "s.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern symmetric\n")
        f.write("3 3 3\n1 1\n2 1\n3 2\n")
    row, col, val, nr, nc = native.read_mtx(p)
    # diagonal kept once, off-diagonals mirrored
    pairs = sorted(zip(row.tolist(), col.tolist()))
    assert pairs == [(0, 0), (0, 1), (1, 0), (1, 2), (2, 1)]


def test_coo_to_csr_host():
    dst = np.array([0, 0, 1, 3, 3, 3], np.int32)
    out = native.coo_to_csr_host(dst, 5)
    np.testing.assert_array_equal(out, [0, 2, 3, 3, 6, 6])


def test_bat_tiles_match_numpy():
    """Native BAT (window, vblock) incidence builder ≡ the numpy
    run-compaction + coverage-tile path in build_bat_plan_host."""
    rng = np.random.default_rng(11)
    for nnz, n_seg, e_tile, s_tile in [
        (3003, 400, 64, 64),
        (10_000, 257, 128, 256),
        (513, 4000, 64, 128),  # many empty windows
        (7, 1000, 64, 64),
    ]:
        dst = np.sort(rng.integers(0, n_seg, nnz)).astype(np.int32)
        out = native.build_bat_tiles(dst, n_seg, e_tile, s_tile)
        assert out is not None
        ob_n, vb_n = out
        # numpy reference (the fallback path inside build_bat_plan_host)
        n_blocks = max(-(-n_seg // s_tile), 1)
        n_vblocks = max(-(-nnz // e_tile), 1)
        win = dst // s_tile
        blk = np.arange(nnz, dtype=np.int64) // e_tile
        key = win * n_vblocks + blk
        head = np.empty(nnz, bool)
        head[0] = True
        np.not_equal(key[1:], key[:-1], out=head[1:])
        uniq = key[head]
        ob = (uniq // n_vblocks).astype(np.int32)
        vb = (uniq % n_vblocks).astype(np.int32)
        missing = np.setdiff1d(np.arange(n_blocks, dtype=np.int32), ob)
        if len(missing):
            ob = np.concatenate([ob, missing])
            vb = np.concatenate([vb, np.zeros(len(missing), np.int32)])
            order = np.argsort(ob, kind="stable")
            ob, vb = ob[order], vb[order]
            vb = np.maximum.accumulate(vb).astype(np.int32)
        np.testing.assert_array_equal(ob_n, ob)
        np.testing.assert_array_equal(vb_n, vb)
