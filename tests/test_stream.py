"""Tests for the output-stationary streaming SpMM path (stream_plan + kernel
+ hybrid dispatch). Reference oracle: `jax.ops.segment_sum`, mirroring the
reference's op unit tests (`/root/reference/test/test_gather_scatter.py:4-27`
vs torch.sparse.mm)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geot_tpu.graph.stream_plan import (
    HybridPlan,
    build_stream_split_host,
    cell_census,
    stream_plan_from_host,
)
from geot_tpu.graph.structures import build_graph
from geot_tpu.graph.datasets import synthetic_clustered_graph
from geot_tpu.ops.api import _spmm_fwd_hybrid, _stream_sum, segment_spmm


def _clustered_edges(n, nnz_dense, nnz_uniform, s_tile=256, x_rows=256, seed=0):
    """Edges with dense (window, block) cells plus uniform noise. Cell
    density 1500 sits above the round-4 cost-model crossover at SMALL
    tables (bat_edge_ns = 4.5 there, so cells must be ~1k+ edges to beat
    the gather path; at products-scale tables the crossover is ~80)."""
    rng = np.random.default_rng(seed)
    n_w = max(n // s_tile, 1)
    n_b = max(n // x_rows, 1)
    epc = 1500
    n_cells = max(nnz_dense // epc, 1)
    cw = rng.integers(0, n_w, n_cells)
    cb = rng.integers(0, n_b, n_cells)
    dst = (cw[:, None] * s_tile + rng.integers(0, s_tile, (n_cells, epc))).reshape(-1)
    src = (cb[:, None] * x_rows + rng.integers(0, x_rows, (n_cells, epc))).reshape(-1)
    dst = np.concatenate([dst, rng.integers(0, n, nnz_uniform)])
    src = np.concatenate([src, rng.integers(0, n, nnz_uniform)])
    dst = np.minimum(dst, n - 1)
    src = np.minimum(src, n - 1)
    order = np.argsort(dst, kind="stable")
    return src[order].astype(np.int32), dst[order].astype(np.int32)


def _ref(src, dst, x, n, w=None):
    v = x[src]
    if w is not None:
        v = v * w[:, None]
    return jax.ops.segment_sum(v, jnp.asarray(dst), num_segments=n)


@pytest.mark.parametrize("weighted", [False, True])
def test_stream_split_matches_reference(weighted):
    n = 1500
    src, dst, = _clustered_edges(n, 30_000, 3_000)
    rng = np.random.default_rng(1)
    w = rng.standard_normal(len(src)).astype(np.float32) if weighted else None
    families, rest_mask, stats = build_stream_split_host(
        dst, src, n, n, edge_weight=w, min_stream_frac=0.05
    )
    assert families is not None, stats
    assert stats["stream_frac"] > 0.5, stats
    sps = tuple(stream_plan_from_host(a, m) for a, m in families)
    x = rng.standard_normal((n, 96)).astype(np.float32)
    out = _stream_sum(sps, jnp.asarray(x))
    # streamed part only: reference over the streamed edges
    sm = ~rest_mask
    ref = _ref(src[sm], dst[sm], x, n, None if w is None else w[sm])
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_stream_chunked_scan_matches_reference():
    n = 2000
    src, dst = _clustered_edges(n, 40_000, 0, seed=2)
    families, rest_mask, stats = build_stream_split_host(
        dst, src, n, n, min_stream_frac=0.05, max_chunk_tiles=8
    )
    assert families is not None, stats
    assert any(len(m["chunks"]) > 2 for _, m in families), (
        stats, [m["chunks"] for _, m in families])
    sps = tuple(stream_plan_from_host(a, m) for a, m in families)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((n, 64)).astype(np.float32)
    out = _stream_sum(sps, jnp.asarray(x))
    sm = ~rest_mask
    ref = _ref(src[sm], dst[sm], x, n)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_hybrid_covers_all_edges():
    # n large enough that the uniform noise dilutes over many cells (tiny
    # graphs have so few cells that even noise streams)
    n = 6000
    src, dst = _clustered_edges(n, 20_000, 8_000, seed=4)
    rng = np.random.default_rng(5)
    w = rng.standard_normal(len(src)).astype(np.float32)
    g = build_graph(src, dst, n, edge_weight=w, feature_hint=96)
    assert g.hyb is not None and g.hyb.rest is not None
    x = rng.standard_normal((n, 96)).astype(np.float32)
    out = _spmm_fwd_hybrid(g.hyb, jnp.asarray(x))
    ref = _ref(np.asarray(g.src), np.asarray(g.dst), x, n, w=np.asarray(g.edge_weight))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_segment_spmm_dispatches_hybrid_and_grads():
    n = 1200
    src, dst = _clustered_edges(n, 20_000, 2_000, seed=6)
    rng = np.random.default_rng(7)
    w = (rng.standard_normal(len(src)) ** 2 + 0.1).astype(np.float32)
    g = build_graph(src, dst, n, edge_weight=w, feature_hint=96)
    assert g.hyb is not None and g.hyb_t is not None
    x = rng.standard_normal((n, 96)).astype(np.float32)
    xj = jnp.asarray(x)
    out = segment_spmm(g, xj, backend="pallas")
    ref = _ref(np.asarray(g.src), np.asarray(g.dst), x, n, w=np.asarray(g.edge_weight))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)

    cot = jnp.asarray(rng.standard_normal(out.shape).astype(np.float32))
    grad = jax.grad(lambda xx: jnp.vdot(segment_spmm(g, xx, backend="pallas"), cot))(xj)
    grad_ref = jax.grad(
        lambda xx: jnp.vdot(
            _ref(np.asarray(g.src), np.asarray(g.dst), xx, n,
                 w=np.asarray(g.edge_weight)), cot)
    )(xj)
    np.testing.assert_allclose(grad, grad_ref, rtol=2e-4, atol=2e-4)


def test_stream_bf16_fast_path():
    """bf16 features ride the 2-pass kernel variant (select output exact in
    bf16, weights folded into the dst one-hot) with an f32 carry; accuracy
    within the bf16 error budget (VERDICT r4 Next #2; reference supports
    reduced precision via f32 accumulation, csrc/cpu/index_scatter_cpu.cpp)."""
    n = 1500
    src, dst = _clustered_edges(n, 30_000, 3_000)
    rng = np.random.default_rng(11)
    w = rng.standard_normal(len(src)).astype(np.float32)
    families, rest_mask, stats = build_stream_split_host(
        dst, src, n, n, edge_weight=w, min_stream_frac=0.05
    )
    assert families is not None, stats
    sps = tuple(stream_plan_from_host(a, m) for a, m in families)
    x = rng.standard_normal((n, 96)).astype(np.float32)
    out = _stream_sum(sps, jnp.asarray(x).astype(jnp.bfloat16))
    assert out.dtype == jnp.bfloat16
    sm = ~rest_mask
    ref = _ref(src[sm], dst[sm], x, n, w[sm])
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=0.05, atol=0.05
    )


def test_hybrid_bf16_end_to_end():
    n = 1200
    src, dst = _clustered_edges(n, 20_000, 2_000, seed=6)
    rng = np.random.default_rng(7)
    w = (rng.standard_normal(len(src)) ** 2 + 0.1).astype(np.float32)
    g = build_graph(src, dst, n, edge_weight=w, feature_hint=96)
    assert g.hyb is not None
    x = rng.standard_normal((n, 96)).astype(np.float32)
    out = segment_spmm(g, jnp.asarray(x).astype(jnp.bfloat16), backend="pallas")
    assert out.dtype == jnp.bfloat16
    ref = _ref(np.asarray(g.src), np.asarray(g.dst), x, n,
               w=np.asarray(g.edge_weight))
    # bf16 error budget: ~2^-8 relative per term; absolute floor covers
    # cancellation on near-zero sums
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=0.05, atol=0.2
    )


def test_uniform_graph_skips_stream():
    # n large enough that uniform edges spread thin over the cell grid
    # (mean ~1.2 edges/cell << tau); at small n even uniform graphs have
    # dense cells and legitimately stream — the census, not uniformity
    # itself, is the dispatch statistic
    n = 40_000
    rng = np.random.default_rng(8)
    src = rng.integers(0, n, 30_000).astype(np.int32)
    dst = np.sort(rng.integers(0, n, 30_000)).astype(np.int32)
    families, rest_mask, stats = build_stream_split_host(dst, src, n, n)
    assert families is None and rest_mask.all()
    g = build_graph(src, dst, n, feature_hint=128)
    assert g.hyb is None  # degenerates to the BAT path


def test_mixed_tile_size_families():
    # hub cells (huge) get big tiles, modest cells small ones (round-4
    # per-cell e_tile assignment); both families must agree with the oracle
    n = 4096
    rng = np.random.default_rng(9)
    # one giant cell in the LAST (window, block) — cnt 4000 is where
    # e_tile=4096 beats 2048 (1x8.94us vs 2x4.94us) — plus modest
    # 1500-edge cells confined to earlier windows (no accidental merge)
    dst_h = n - 256 + rng.integers(0, 256, 4000)
    src_h = n - 256 + rng.integers(0, 256, 4000)
    src_m, dst_m = _clustered_edges(n - 512, 18_000, 0, seed=10)
    dst = np.concatenate([dst_h, dst_m]).astype(np.int64)
    src = np.concatenate([src_h, src_m]).astype(np.int64)
    order = np.argsort(dst, kind="stable")
    dst, src = dst[order], src[order]
    families, rest_mask, stats = build_stream_split_host(
        dst, src, n, n, min_stream_frac=0.05
    )
    assert families is not None, stats
    e_tiles = sorted(m["e_tile"] for _, m in families)
    assert len(e_tiles) >= 2 and e_tiles[-1] >= 4096, stats["families"]
    sps = tuple(stream_plan_from_host(a, m) for a, m in families)
    x = rng.standard_normal((n, 96)).astype(np.float32)
    out = _stream_sum(sps, jnp.asarray(x))
    sm = ~rest_mask
    ref = _ref(src[sm], dst[sm], x, n)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_cell_census_separates_regimes():
    g_c = synthetic_clustered_graph(20_000, 400_000, mixing=0.2, mean_community=800, seed=0)
    g_u = synthetic_clustered_graph(20_000, 400_000, mixing=1.0, mean_community=800, seed=0)
    c_c = cell_census(g_c.dst, g_c.src)
    c_u = cell_census(g_u.dst, g_u.src)
    # note: even mixing=1.0 keeps some dense cells — Zipf dst hubs make
    # whole hub windows dense regardless of src locality (measured 0.28);
    # community structure adds the rest (measured 0.81)
    assert c_c["frac_ge_128"] > 0.6, (c_c, c_u)
    assert c_u["frac_ge_128"] < c_c["frac_ge_128"] - 0.3, (c_c, c_u)


def test_clustered_generator_intra_fraction():
    g = synthetic_clustered_graph(10_000, 100_000, mixing=0.3, seed=1)
    # communities are contiguous id ranges; estimate intra fraction via the
    # census being far denser than uniform
    c = cell_census(g.dst, g.src, s_tile=256, x_rows=256)
    assert c["mean"] > 20, c
