"""SegmentPlan invariants: every edge slotted once, windows confined,
coverage complete, padding masked."""

import numpy as np
import pytest

from geot_tpu.graph.plan import build_segment_plan, plan_tile_bounds


def _random_sorted_graph(rng, nnz, n_seg, power=1.2):
    ranks = np.arange(1, n_seg + 1, dtype=np.float64)
    p = ranks ** -power
    p /= p.sum()
    dst = np.sort(rng.choice(n_seg, size=nnz, p=p)).astype(np.int32)
    src = rng.integers(0, n_seg, size=nnz, dtype=np.int32)
    return src, dst


@pytest.mark.parametrize("nnz,n_seg,e_tile,s_tile", [
    (1000, 100, 64, 32),
    (1000, 100, 256, 128),
    (37, 512, 16, 64),       # sparser than one edge per window
    (5000, 13, 128, 128),    # heavy-degree, few segments
    (0, 50, 32, 32),         # empty graph
    (1, 1, 8, 8),
])
def test_plan_invariants(nnz, n_seg, e_tile, s_tile):
    rng = np.random.default_rng(0)
    if nnz:
        src, dst = _random_sorted_graph(rng, nnz, n_seg)
    else:
        src = dst = np.zeros(0, dtype=np.int32)
    plan = build_segment_plan(dst, src, n_seg, e_tile=e_tile, s_tile=s_tile)

    T = plan.num_tiles
    assert T <= plan_tile_bounds(nnz, n_seg, e_tile, s_tile)
    mask = np.asarray(plan.mask)
    dst_slots = np.asarray(plan.dst_slots)
    src_slots = np.asarray(plan.src_slots)
    edge_pos = np.asarray(plan.edge_pos)
    out_block = np.asarray(plan.out_block)

    # real-edge count and bijection to original edges
    assert mask.sum() == nnz
    real = mask.reshape(-1) > 0
    pos = edge_pos.reshape(-1)[real]
    assert sorted(pos.tolist()) == list(range(nnz))
    np.testing.assert_array_equal(dst_slots.reshape(-1)[real], dst[pos])
    np.testing.assert_array_equal(src_slots.reshape(-1)[real], src[pos])

    # window confinement: every slot's dst inside its tile's window
    base = (out_block * s_tile)[:, None]
    assert np.all(dst_slots >= base)
    assert np.all(dst_slots < base + s_tile)

    # ordering + full coverage of output windows
    assert np.all(np.diff(out_block) >= 0)
    n_blocks = plan.n_blocks
    assert set(out_block.tolist()) == set(range(n_blocks))
    assert n_blocks * s_tile >= n_seg

    # AEB invariants: slot j of tile t holds edge e0[t]+j, e0 is
    # pack-aligned and non-decreasing with steps <= e_tile
    e0 = np.asarray(plan.e0)
    assert np.all(e0 % plan.pack_align == 0)
    assert np.all(np.diff(e0) >= 0)
    assert np.all(np.diff(e0) <= e_tile)
    slot_j = np.tile(np.arange(e_tile), T)
    edge_of_slot = np.repeat(e0, e_tile) + slot_j
    np.testing.assert_array_equal(edge_of_slot[real], pos)


def test_plan_rejects_unsorted():
    with pytest.raises(ValueError):
        build_segment_plan(np.array([3, 1, 2]), None, 4)


def test_plan_rejects_out_of_range():
    with pytest.raises(ValueError):
        build_segment_plan(np.array([0, 5]), None, 4)


def test_compute_chunks_properties():
    """Chunks are window-aligned, consecutive, cover all tiles, and respect
    the SMEM prefetch cap."""
    import numpy as np

    from geot_tpu.graph.plan import MAX_PREFETCH_TILES, compute_chunks

    rng = np.random.default_rng(0)
    # irregular window sizes incl. one giant window
    sizes = list(rng.integers(1, 40, 50)) + [9000] + list(rng.integers(1, 40, 20))
    ob = np.repeat(np.arange(len(sizes)), sizes).astype(np.int32)
    ch = compute_chunks(ob, 10**9)
    assert ch, "should chunk when tiles exceed the prefetch cap"
    assert ch[0][0] == 0 and ch[-1][1] == len(ob)
    for (a0, a1, aw0, aw1), (b0, b1, bw0, bw1) in zip(ch[:-1], ch[1:]):
        assert a1 == b0 and bw0 in (aw1, aw1 - 1)
    for t0, t1, w0, w1 in ch:
        assert ob[t0] == w0 and ob[t1 - 1] == w1 - 1
        # every chunk respects the SMEM prefetch cap (giant windows are
        # split mid-window and add-combined by the executor)
        assert t1 - t0 <= MAX_PREFETCH_TILES
    # overlap only ever shares one window between consecutive chunks
    for a, b in zip(ch[:-1], ch[1:]):
        assert a[1] == b[0]
        assert b[2] in (a[3], a[3] - 1)
