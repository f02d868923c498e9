"""Block-format preprocessing vs dense oracle (reference parity:
`geot/format_preprocess.py` verified against FS_Block)."""

import numpy as np

from geot_tpu.graph.block_format import block_stats, csr_to_block_format
from geot_tpu.graph.preprocess import coo_to_csr


def _csr(rng, n_rows, n_cols, nnz):
    row = np.sort(rng.integers(0, n_rows, nnz).astype(np.int32))
    col = rng.integers(0, n_cols, nnz).astype(np.int32)
    vals = rng.standard_normal(nnz).astype(np.float32)
    indptr = np.asarray(coo_to_csr(row, n_rows))
    return indptr, col, vals, row


def test_blocks_reconstruct_dense():
    rng = np.random.default_rng(0)
    n_rows, n_cols, nnz = 37, 50, 300
    indptr, col, vals, row = _csr(rng, n_rows, n_cols, nnz)
    bf = csr_to_block_format(indptr, col, vals, window_rows=8, wide=16)
    dense = np.zeros((n_rows, n_cols), np.float32)
    np.add.at(dense, (row, col), vals)
    for w in range(bf.n_windows):
        blk = bf.dense_block(w, indptr, col)
        cols_w = bf.col_ids[bf.win_ptr[w] : bf.win_ptr[w + 1]]
        r0 = w * 8
        r1 = min(r0 + 8, n_rows)
        # scatter window block back through its column map
        rec = np.zeros((r1 - r0, n_cols), np.float32)
        for j, c in enumerate(cols_w):
            rec[:, c] += blk[:, j] * (j < len(np.unique(cols_w)) or 1)
        # padding slots repeat a real column but the block holds zeros there
        np.testing.assert_allclose(rec, dense[r0:r1], atol=1e-6)


def test_widths_are_wide_multiples_and_stats():
    rng = np.random.default_rng(1)
    indptr, col, vals, _ = _csr(rng, 64, 100, 800)
    bf = csr_to_block_format(indptr, col, vals, window_rows=16, wide=8)
    widths = np.diff(bf.win_ptr)
    assert (widths % 8 == 0).all() and (widths > 0).all()
    st = block_stats(bf, 800)
    assert st["n_windows"] == 4
    assert st["dedup_ratio"] > 0


def test_col_local_consistency():
    rng = np.random.default_rng(2)
    indptr, col, vals, _ = _csr(rng, 30, 40, 250)
    bf = csr_to_block_format(indptr, col, vals, window_rows=8, wide=16)
    for w in range(bf.n_windows):
        r0, r1 = w * 8, min((w + 1) * 8, 30)
        for e in range(indptr[r0], indptr[r1]):
            slot = bf.win_ptr[w] + bf.col_local[e]
            assert bf.col_ids[slot] == col[e]


def test_rcm_reorder_improves_window_dedup():
    """RCM on a community-structured graph raises the per-window source
    dedup ratio — the measurable lever behind the FlashSparse-style block
    format (`baseline/FlashSparse`, `geot/format_preprocess.py`)."""
    import numpy as np
    from geot_tpu.graph.reorder import (
        apply_order, measure_window_dedup, rcm_order,
    )

    rng = np.random.default_rng(3)
    # two-level community graph: nodes grouped in clusters of 32, 90% of
    # edges intra-cluster — then SHUFFLED so the raw labels have no locality
    n, k = 2048, 32
    edges = []
    for c in range(n // k):
        lo = c * k
        m = 400
        edges.append(
            (rng.integers(lo, lo + k, m), rng.integers(lo, lo + k, m))
        )
    s = np.concatenate([e[0] for e in edges])
    d = np.concatenate([e[1] for e in edges])
    sx = rng.integers(0, n, len(s) // 9)
    dx = rng.integers(0, n, len(s) // 9)
    s, d = np.concatenate([s, sx]), np.concatenate([d, dx])
    shuf = rng.permutation(n)
    s, d, _ = apply_order(shuf, s, d)

    base = measure_window_dedup(s, d, n, s_tile=64)
    order = rcm_order(s, d, n)
    after = measure_window_dedup(s, d, n, s_tile=64, order=order)
    assert after["dedup_ratio"] > base["dedup_ratio"] * 1.5, (base, after)
    # permutation sanity
    s2, d2, inv = apply_order(order, s, d)
    assert sorted(np.bincount(d2, minlength=n)) == sorted(
        np.bincount(d, minlength=n)
    )
