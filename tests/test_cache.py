"""Graph preprocessing cache round-trip (geot_tpu/graph/cache.py)."""

import numpy as np
import jax.numpy as jnp

from geot_tpu.graph.cache import cached_build, load_graph, save_graph
from geot_tpu.graph.structures import build_graph
from geot_tpu.ops import api as ops


def _graph(monkeypatch=None):
    rng = np.random.default_rng(4)
    n, nnz = 300, 2500
    dst = np.sort(rng.integers(0, n, nnz)).astype(np.int32)
    src = rng.integers(0, n, nnz).astype(np.int32)
    w = rng.standard_normal(nnz).astype(np.float32)
    return build_graph(src, dst, n, edge_weight=w, assume_sorted=True,
                       e_tile=64, s_tile=64), rng


def test_graph_npz_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("GEOT_BUCKET_TABLE_BYTES", "1")  # force bucketed too
    g, rng = _graph()
    assert g.bat is not None and g.bat_b is not None
    p = str(tmp_path / "g.npz")
    save_graph(g, p)
    g2 = load_graph(p)
    assert g2 is not None
    assert g2.num_nodes == g.num_nodes
    assert g2.prefer == g.prefer and g2.prefer_dyn == g.prefer_dyn
    np.testing.assert_array_equal(np.asarray(g2.dst), np.asarray(g.dst))
    assert g2.bat.chunks == g.bat.chunks
    if g.hyb is not None:  # hybrid stream plans round-trip too
        assert g2.hyb is not None
        assert len(g2.hyb.stream) == len(g.hyb.stream)
        for spa, spb in zip(g2.hyb.stream, g.hyb.stream):
            assert spa.e_tile == spb.e_tile and spa.chunks == spb.chunks
            np.testing.assert_array_equal(
                np.asarray(spa.srcl3), np.asarray(spb.srcl3)
            )
        assert (g2.hyb.rest is None) == (g.hyb.rest is None)
    assert g2.bat_b.bucket_rows == g.bat_b.bucket_rows
    np.testing.assert_array_equal(
        np.asarray(g2.bat.dst3), np.asarray(g.bat.dst3)
    )
    # identical op results through the loaded graph
    x = jnp.asarray(rng.standard_normal((g.num_nodes, 32)).astype(np.float32))
    a = ops.segment_spmm(g, x, backend="reference")
    b = ops.segment_spmm(g2, x, backend="reference")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_cached_build_hits(tmp_path):
    calls = []

    def build():
        calls.append(1)
        g, _ = _graph()
        return g

    g1 = cached_build("k1", build, cache_dir=str(tmp_path))
    g2 = cached_build("k1", build, cache_dir=str(tmp_path))
    assert len(calls) == 1
    np.testing.assert_array_equal(np.asarray(g1.dst), np.asarray(g2.dst))
