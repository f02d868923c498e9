"""Op correctness: Pallas plan path (interpret mode on CPU) and reference
backend vs dense-matmul oracles — tier-1 parity with the reference op tests
(`test/test_index_scatter.py`, `test_gather_scatter.py`,
`test_gather_weight_scatter.py`, `test_csr_gws.py`, `test_mh_spmm.py`,
`test_sddmm.py`). Unlike the reference (atomics ⇒ atol=1e-4), the Pallas
path is deterministic, so we also check bit-stability across runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import geot_tpu
from geot_tpu.graph import build_graph, coo_to_csr
from geot_tpu.graph.plan import build_segment_plan


def _graph(rng, n_nodes, nnz, power=1.0):
    ranks = np.arange(1, n_nodes + 1, dtype=np.float64)
    p = ranks ** -power
    p /= p.sum()
    dst = np.sort(rng.choice(n_nodes, size=nnz, p=p)).astype(np.int32)
    src = rng.integers(0, n_nodes, size=nnz, dtype=np.int32)
    return src, dst


def _dense_adj(src, dst, w, n):
    a = np.zeros((n, n), dtype=np.float64)
    np.add.at(a, (dst, src), w)
    return a


@pytest.mark.parametrize("n_feat", [1, 7, 16, 32, 100, 128, 200])
@pytest.mark.parametrize("e_tile,s_tile", [(64, 128), (256, 128)])
def test_gather_weight_scatter_pallas(n_feat, e_tile, s_tile):
    rng = np.random.default_rng(42)
    n, nnz = 300, 2000
    src, dst = _graph(rng, n, nnz)
    w = rng.standard_normal(nnz).astype(np.float32)
    x = rng.standard_normal((n, n_feat)).astype(np.float32)
    g = build_graph(src, dst, n, edge_weight=w, e_tile=e_tile, s_tile=s_tile,
                    assume_sorted=True)

    out = geot_tpu.gather_weight_scatter(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w), jnp.asarray(x),
        n, graph=g, backend="pallas",
    )
    expect = _dense_adj(src, dst, w, n) @ x.astype(np.float64)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-4, atol=2e-4)

    # determinism (no atomics — exact repeatability)
    out2 = geot_tpu.gather_weight_scatter(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w), jnp.asarray(x),
        n, graph=g, backend="pallas",
    )
    assert np.array_equal(np.asarray(out), np.asarray(out2))


def test_gather_scatter_pallas_and_reference():
    rng = np.random.default_rng(0)
    n, nnz, f = 100, 1000, 32
    src, dst = _graph(rng, n, nnz)
    x = rng.standard_normal((n, f)).astype(np.float32)
    g = build_graph(src, dst, n, assume_sorted=True, e_tile=128, s_tile=128)
    expect = _dense_adj(src, dst, np.ones(nnz), n) @ x.astype(np.float64)
    for backend in ("pallas", "reference"):
        out = geot_tpu.gather_scatter(
            jnp.asarray(src), jnp.asarray(dst), jnp.asarray(x), n,
            graph=g, backend=backend,
        )
        np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("reduce", ["sum", "mean", "max", "min"])
def test_index_scatter_reference_reduces(reduce):
    rng = np.random.default_rng(3)
    nnz, n_seg, f = 1000, 100, 32
    idx = np.sort(rng.integers(0, n_seg, nnz)).astype(np.int32)
    vals = rng.standard_normal((nnz, f)).astype(np.float32)
    out = geot_tpu.index_scatter(
        jnp.asarray(vals), jnp.asarray(idx), n_seg, reduce=reduce,
        backend="reference",
    )
    expect = np.zeros((n_seg, f))
    for s in range(n_seg):
        rows = vals[idx == s]
        if len(rows) == 0:
            continue
        if reduce == "sum":
            expect[s] = rows.sum(0)
        elif reduce == "mean":
            expect[s] = rows.mean(0)
        elif reduce == "max":
            expect[s] = rows.max(0)
        elif reduce == "min":
            expect[s] = rows.min(0)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("reduce", ["sum", "mean"])
@pytest.mark.parametrize("n_feat", [8, 64])
def test_index_scatter_pallas(reduce, n_feat):
    rng = np.random.default_rng(4)
    nnz, n_seg = 2000, 150
    idx = np.sort(rng.integers(0, n_seg, nnz)).astype(np.int32)
    vals = rng.standard_normal((nnz, n_feat)).astype(np.float32)
    plan = build_segment_plan(idx, None, n_seg, e_tile=128, s_tile=128)
    out = geot_tpu.index_scatter(
        jnp.asarray(vals), jnp.asarray(idx), n_seg, reduce=reduce,
        plan=plan, backend="pallas",
    )
    expect = geot_tpu.index_scatter(
        jnp.asarray(vals), jnp.asarray(idx), n_seg, reduce=reduce,
        backend="reference",
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize(
    "H,D",
    [(4, 8), (4, 64), (2, 100), (8, 32),
     (4, 16),   # flat 64-lane layout + inert pad lanes (campaign mh4 shape)
     (3, 96)],  # head 1 straddles the 128-lane f_tile boundary
)
def test_mh_spmm(H, D):
    rng = np.random.default_rng(5)
    n, nnz = 120, 900
    src, dst = _graph(rng, n, nnz)
    w = rng.standard_normal((nnz, H)).astype(np.float32)
    x = rng.standard_normal((n, H, D)).astype(np.float32)
    g = build_graph(src, dst, n, assume_sorted=True, e_tile=128, s_tile=128)

    out = geot_tpu.mh_spmm(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w), jnp.asarray(x),
        n, graph=g, backend="pallas",
    )
    # oracle: eager index_select → mul → index_add (test/test_mh_spmm.py:4-28)
    expect = np.zeros((n, H, D))
    np.add.at(expect, dst, x[src] * w[:, :, None])
    np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-4, atol=2e-4)

    out_t = geot_tpu.mh_spmm_transposed(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w.T), jnp.asarray(x),
        n, graph=g, backend="pallas",
    )
    np.testing.assert_allclose(np.asarray(out_t), expect, rtol=2e-4, atol=2e-4)


def test_csr_gws():
    rng = np.random.default_rng(6)
    n, nnz, f = 80, 600, 48
    src, dst = _graph(rng, n, nnz)
    w = rng.standard_normal(nnz).astype(np.float32)
    indptr = coo_to_csr(jnp.asarray(dst), n)  # dst sorted → rows = dst
    g = build_graph(src, dst, n, edge_weight=w, assume_sorted=True)
    expect = _dense_adj(src, dst, w, n) @ rng.standard_normal((n, f))
    x = expect  # placeholder to reuse rng shape; recompute properly below
    x = rng.standard_normal((n, f)).astype(np.float32)
    expect = _dense_adj(src, dst, w, n) @ x.astype(np.float64)
    for backend in ("pallas", "reference"):
        out = geot_tpu.csr_gws(
            indptr, jnp.asarray(src), jnp.asarray(w), jnp.asarray(x),
            graph=g, backend=backend,
        )
        np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-4, atol=2e-4)


def test_sddmm_coo():
    rng = np.random.default_rng(7)
    n, nnz, f = 60, 500, 40
    src, dst = _graph(rng, n, nnz)
    a = rng.standard_normal((n, f)).astype(np.float32)
    b = rng.standard_normal((n, f)).astype(np.float32)
    out = geot_tpu.sddmm_coo(jnp.asarray(src), jnp.asarray(dst),
                             jnp.asarray(a), jnp.asarray(b))
    expect = np.sum(a[dst] * b[src], axis=-1)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-5)


def test_segment_spmm_mean_and_empty_segments():
    rng = np.random.default_rng(8)
    n, nnz, f = 200, 700, 24
    # leave nodes [150, 200) with no incoming edges
    dst = np.sort(rng.integers(0, 150, nnz)).astype(np.int32)
    src = rng.integers(0, n, nnz, dtype=np.int32)
    x = rng.standard_normal((n, f)).astype(np.float32)
    g = build_graph(src, dst, n, assume_sorted=True)
    out = geot_tpu.segment_spmm(g, jnp.asarray(x), reduce="mean",
                                backend="pallas")
    expect = np.zeros((n, f))
    cnt = np.zeros(n)
    np.add.at(expect, dst, x[src])
    np.add.at(cnt, dst, 1)
    expect /= np.maximum(cnt, 1)[:, None]
    np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-4, atol=2e-4)


def test_gather_weight_scatter_bf16():
    """bf16 feature path: kernels take the single-pass MXU route; results
    accumulate in f32 and match the f32 reference to bf16 tolerance."""
    import numpy as np
    import jax.numpy as jnp
    from geot_tpu.graph.structures import build_graph
    from geot_tpu.ops import api as ops
    from geot_tpu.ops import reference as ref

    rng = np.random.default_rng(40)
    n, e, F = 90, 500, 64
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    w = rng.standard_normal(e).astype(np.float32)
    g = build_graph(src, dst, n, edge_weight=w, e_tile=128, s_tile=128)
    x = rng.standard_normal((n, F)).astype(np.float32)
    out_bf = ops.segment_spmm(g, jnp.asarray(x, jnp.bfloat16), backend="pallas")
    assert out_bf.dtype == jnp.bfloat16
    expect = ref.gather_weight_scatter_ref(
        g.src, g.dst, g.edge_weight, jnp.asarray(x), n
    )
    scale = float(jnp.max(jnp.abs(expect))) + 1e-6
    diff = float(jnp.max(jnp.abs(out_bf.astype(jnp.float32) - expect)))
    assert diff < 0.05 * scale, (diff, scale)


def test_gat_attention_spmm_matches_edge_order():
    """Fused slot-space attention ≡ segment_softmax + mh_spmm (fwd + grad)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from geot_tpu.models.conv import prepare_graph
    from geot_tpu.ops import api as ops
    from geot_tpu.ops import reference as refmod

    rng = np.random.default_rng(50)
    n, e, H, D = 70, 400, 4, 8
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    g = prepare_graph(src, dst, n, add_self_loops=True, e_tile=64, s_tile=128)
    xh = jnp.asarray(rng.standard_normal((n, H, D)).astype(np.float32))
    a_s = jnp.asarray(0.3 * rng.standard_normal((n, H)).astype(np.float32))
    a_d = jnp.asarray(0.3 * rng.standard_normal((n, H)).astype(np.float32))

    def edge_order(xh, a_s, a_d):
        logits = jax.nn.leaky_relu(a_s[g.src] + a_d[g.dst], 0.2)
        att = ops.segment_softmax(logits, g.dst, n)
        return refmod.mh_spmm_ref(g.src, g.dst, att, xh, n)

    def fused(xh, a_s, a_d):
        return ops.gat_attention_spmm(g, xh, a_s, a_d, backend="pallas")

    out_e = edge_order(xh, a_s, a_d)
    out_f = fused(xh, a_s, a_d)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_e), rtol=1e-4, atol=1e-4
    )
    co = jnp.asarray(rng.standard_normal((n, H, D)).astype(np.float32))
    ge = jax.grad(lambda *a: jnp.vdot(edge_order(*a), co), argnums=(0, 1, 2))(
        xh, a_s, a_d
    )
    gf = jax.grad(lambda *a: jnp.vdot(fused(*a), co), argnums=(0, 1, 2))(
        xh, a_s, a_d
    )
    for a, b in zip(ge, gf):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )

    # big-graph composition route (GEOT_GAT_FUSED_MAX_EDGES exceeded →
    # edge-space softmax + chunk-streamed mh kernel, the reddit2 HBM-fit
    # path): same value and grads as the fused program
    import os as _os

    _os.environ["GEOT_GAT_FUSED_MAX_EDGES"] = "1"
    try:
        out_c = fused(xh, a_s, a_d)
        np.testing.assert_allclose(
            np.asarray(out_c), np.asarray(out_e), rtol=1e-4, atol=1e-4
        )
        gc = jax.grad(
            lambda *a: jnp.vdot(fused(*a), co), argnums=(0, 1, 2)
        )(xh, a_s, a_d)
        for a, b in zip(ge, gc):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
            )
    finally:
        del _os.environ["GEOT_GAT_FUSED_MAX_EDGES"]


def test_chunked_streaming_matches_unchunked():
    """plan.chunks streaming execution ≡ single-shot, fwd + via segment_spmm."""
    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    from geot_tpu.graph.plan import compute_chunks
    from geot_tpu.graph.structures import build_graph
    from geot_tpu.ops import api as ops

    rng = np.random.default_rng(60)
    n, e, F = 300, 2000, 48
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    w = rng.standard_normal(e).astype(np.float32)
    g = build_graph(src, dst, n, edge_weight=w, e_tile=64, s_tile=64)
    x = jnp.asarray(rng.standard_normal((n, F)).astype(np.float32))
    out_ref = ops.segment_spmm(g, x, backend="pallas")
    # force small chunks (3 tiles each)
    ch = compute_chunks(np.asarray(g.plan.out_block), 3)
    assert len(ch) > 2
    g2 = dataclasses.replace(
        g,
        plan=dataclasses.replace(g.plan, chunks=ch),
        plan_t=dataclasses.replace(
            g.plan_t, chunks=compute_chunks(np.asarray(g.plan_t.out_block), 3)
        ),
    )
    out_c = ops.segment_spmm(g2, x, backend="pallas")
    np.testing.assert_allclose(
        np.asarray(out_c), np.asarray(out_ref), rtol=1e-5, atol=1e-5
    )
    # gradient through the chunked static-weight path
    import jax

    gr = jax.grad(lambda xx: jnp.sum(ops.segment_spmm(g2, xx, backend="pallas") ** 2))(x)
    gu = jax.grad(lambda xx: jnp.sum(ops.segment_spmm(g, xx, backend="pallas") ** 2))(x)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gu), rtol=1e-4, atol=1e-4)
    # index_scatter chunked
    vals = jnp.asarray(rng.standard_normal((e, 16)).astype(np.float32))
    dst_sorted = np.asarray(g.dst)
    a = ops.index_scatter(vals, jnp.asarray(dst_sorted), n, plan=g.plan, backend="pallas")
    b = ops.index_scatter(vals, jnp.asarray(dst_sorted), n, plan=g2.plan, backend="pallas")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_chunked_hub_window_overlap_add():
    """A hub destination whose window exceeds the chunk limit is split
    mid-window; overlapping chunk outputs must add-combine exactly."""
    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    from geot_tpu.graph.plan import compute_chunks
    from geot_tpu.graph.structures import build_graph
    from geot_tpu.ops import api as ops
    from geot_tpu.ops import reference as ref

    rng = np.random.default_rng(61)
    n, F = 100, 24
    # hub: node 3 receives 1500 edges; others sparse
    dst = np.concatenate([
        np.full(1500, 3, np.int32),
        rng.integers(0, n, 400).astype(np.int32),
    ])
    src = rng.integers(0, n, len(dst)).astype(np.int32)
    w = rng.standard_normal(len(dst)).astype(np.float32)
    g = build_graph(src, dst, n, edge_weight=w, e_tile=32, s_tile=32)
    ch = compute_chunks(np.asarray(g.plan.out_block), 8)  # hub window ≈ 47 tiles
    assert any(w1 - w0 == 1 and (t1 - t0) <= 8 for t0, t1, w0, w1 in ch)
    # consecutive chunks sharing a window exist
    assert any(b[2] < a[3] for a, b in zip(ch[:-1], ch[1:]))
    g2 = dataclasses.replace(g, plan=dataclasses.replace(g.plan, chunks=ch))
    x = jnp.asarray(rng.standard_normal((n, F)).astype(np.float32))
    out = ops.segment_spmm(g2, x, backend="pallas")
    expect = ref.gather_weight_scatter_ref(g.src, g.dst, g.edge_weight, jnp.asarray(x), n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("n_feat", [16, 48, 128])
def test_dynamic_weight_chunked_aeb(n_feat):
    """Per-call-weight SpMM through the AEB rolled-weight kernels, chunked
    and unchunked, vs the XLA reference (incl. a hub window split)."""
    import dataclasses
    from geot_tpu.graph.plan import compute_chunks
    from geot_tpu.ops import api as ops
    from geot_tpu.ops import reference as ref

    rng = np.random.default_rng(77)
    n = 200
    dst = np.concatenate([
        np.full(700, 5, np.int32),  # hub
        rng.integers(0, n, 900).astype(np.int32),
    ])
    src = rng.integers(0, n, len(dst)).astype(np.int32)
    g = build_graph(src, dst, n, e_tile=64, s_tile=64)
    w = jnp.asarray(rng.standard_normal(len(dst)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((n, n_feat)).astype(np.float32))
    expect = ref.gather_weight_scatter_ref(g.src, g.dst, w, x, n)

    out = geot_tpu.gather_weight_scatter(
        g.src, g.dst, w, x, n, graph=g, backend="pallas"
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=2e-4, atol=2e-4)

    ch = compute_chunks(np.asarray(g.plan.out_block), 5)
    assert len(ch) > 2
    g2 = dataclasses.replace(g, plan=dataclasses.replace(g.plan, chunks=ch))
    out_c = geot_tpu.gather_weight_scatter(
        g2.src, g2.dst, w, x, n, graph=g2, backend="pallas"
    )
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(expect),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("n_feat", [4, 32, 100])
def test_index_scatter_aeb_uniform_chunks(n_feat):
    """index_scatter through the AEB loader on a plan with uniformized
    chunks (pad tiles, rebased e0) vs reference."""
    from geot_tpu.graph.plan import build_segment_plan
    from geot_tpu.ops import api as ops

    rng = np.random.default_rng(78)
    nnz, n_seg = 3000, 400
    idx = np.sort(rng.integers(0, n_seg, nnz)).astype(np.int32)
    vals = jnp.asarray(rng.standard_normal((nnz, n_feat)).astype(np.float32))
    # force uniformized chunks through the builder's max_chunk_slots
    plan = build_segment_plan(
        idx, None, n_seg, e_tile=64, s_tile=64, max_chunk_slots=512
    )
    assert plan.chunks and plan.chunk_blocks > 0
    out = ops.index_scatter(
        vals, jnp.asarray(idx), n_seg, plan=plan, backend="pallas"
    )
    expect = ops.index_scatter(vals, jnp.asarray(idx), n_seg, backend="reference")
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=2e-4, atol=2e-4)


def test_index_scatter_aeb_nondivisible_nnz():
    """nnz not divisible by e_tile: the AEB loader pads the tail block."""
    from geot_tpu.graph.plan import build_segment_plan
    from geot_tpu.ops import api as ops

    rng = np.random.default_rng(79)
    nnz, n_seg = 777, 100
    idx = np.sort(rng.integers(0, n_seg, nnz)).astype(np.int32)
    vals = jnp.asarray(rng.standard_normal((nnz, 24)).astype(np.float32))
    plan = build_segment_plan(idx, None, n_seg, e_tile=128, s_tile=128)
    out = ops.index_scatter(
        vals, jnp.asarray(idx), n_seg, plan=plan, backend="pallas"
    )
    expect = ops.index_scatter(vals, jnp.asarray(idx), n_seg, backend="reference")
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("n_feat", [4, 16, 32, 100, 128])
def test_bat_spmm_static_dynamic_grad(n_feat):
    """v3 BAT kernels: static / dynamic / unweighted SpMM + gradients vs
    the XLA reference, over a hubby graph."""
    from geot_tpu.ops import api as ops
    from geot_tpu.ops import reference as ref

    rng = np.random.default_rng(91)
    n = 220
    dst = np.concatenate([
        np.full(600, 7, np.int32),
        rng.integers(0, n, 1100).astype(np.int32),
    ])
    src = rng.integers(0, n, len(dst)).astype(np.int32)
    w_host = rng.standard_normal(len(dst)).astype(np.float32)
    g = build_graph(src, dst, n, edge_weight=w_host, e_tile=64, s_tile=64,
                    feature_hint=n_feat)
    assert g.bat is not None
    x = jnp.asarray(rng.standard_normal((n, n_feat)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(len(dst)).astype(np.float32))

    # static weights via segment_spmm
    out = ops.segment_spmm(g, x, backend="pallas")
    exp = ref.gather_weight_scatter_ref(g.src, g.dst, g.edge_weight, x, n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(exp), rtol=2e-3, atol=2e-3)
    gr = jax.grad(lambda xx: jnp.sum(ops.segment_spmm(g, xx, backend="pallas") ** 2))(x)
    ge = jax.grad(lambda xx: jnp.sum(
        ref.gather_weight_scatter_ref(g.src, g.dst, g.edge_weight, xx, n) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(ge), rtol=2e-3, atol=2e-3)

    # dynamic weights incl. dw
    out = geot_tpu.gather_weight_scatter(g.src, g.dst, w, x, n, graph=g,
                                         backend="pallas")
    exp = ref.gather_weight_scatter_ref(g.src, g.dst, w, x, n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(exp), rtol=2e-3, atol=2e-3)
    dw = jax.grad(lambda ww: jnp.sum(geot_tpu.gather_weight_scatter(
        g.src, g.dst, ww, x, n, graph=g, backend="pallas") ** 2))(w)
    dwe = jax.grad(lambda ww: jnp.sum(
        ref.gather_weight_scatter_ref(g.src, g.dst, ww, x, n) ** 2))(w)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dwe), rtol=2e-3, atol=3e-3)

    # unweighted + mean
    out = geot_tpu.gather_scatter(g.src, g.dst, x, n, graph=g, backend="pallas")
    exp = ref.gather_scatter_ref(g.src, g.dst, x, n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(exp), rtol=2e-3, atol=2e-3)
    out = ops.segment_spmm(g, x, reduce="mean", backend="pallas")
    exp = ref.gather_weight_scatter_ref(g.src, g.dst, g.edge_weight, x, n, "mean")
    np.testing.assert_allclose(np.asarray(out), np.asarray(exp), rtol=2e-3, atol=2e-3)


def test_bat_index_scatter_chunked():
    """index_scatter over a BatPlan, chunked (uniformized) and not."""
    from geot_tpu.graph.plan import build_bat_plan
    from geot_tpu.ops import api as ops

    rng = np.random.default_rng(92)
    nnz, n_seg = 3003, 400
    idx = np.sort(rng.integers(0, n_seg, nnz)).astype(np.int32)
    for n_feat in (16, 100):
        vals = jnp.asarray(rng.standard_normal((nnz, n_feat)).astype(np.float32))
        from geot_tpu.graph.plan import packed_width
        nw = packed_width(n_feat)
        bp = build_bat_plan(idx, n_seg, e_tile=64, s_tile=64,
                            km_pack=(128 // nw) if nw else 0)
        out = ops.index_scatter(vals, jnp.asarray(idx), n_seg, plan=bp,
                                backend="pallas")
        expect = ops.index_scatter(vals, jnp.asarray(idx), n_seg,
                                   backend="reference")
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   rtol=2e-3, atol=2e-3)
        bpc = build_bat_plan(idx, n_seg, e_tile=64, s_tile=64,
                             km_pack=(128 // nw) if nw else 0,
                             max_chunk_tiles=7)
        assert bpc.chunks and bpc.chunk_blocks > 0
        out_c = ops.index_scatter(vals, jnp.asarray(idx), n_seg, plan=bpc,
                                  backend="pallas")
        np.testing.assert_allclose(np.asarray(out_c), np.asarray(expect),
                                   rtol=2e-3, atol=2e-3)


def test_dynamic_weight_grad_uses_precomposed_transpose():
    """gather_weight_scatter with per-call weights: dx/dw through the
    Pallas path (backward permutes weights once via Graph.edge_pos_t) must
    match dense-oracle gradients."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from geot_tpu.graph.structures import build_graph
    from geot_tpu.ops import api as ops

    rng = np.random.default_rng(70)
    n, e, F = 80, 450, 24
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    g = build_graph(src, dst, n, e_tile=64, s_tile=64)
    x = jnp.asarray(rng.standard_normal((n, F)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(e).astype(np.float32))
    co = jnp.asarray(rng.standard_normal((n, F)).astype(np.float32))

    def f(xx, ww):
        return jnp.vdot(
            ops.gather_weight_scatter(
                g.src, g.dst, ww, xx, n, graph=g, backend="pallas"
            ),
            co,
        )

    gx, gw = jax.grad(f, argnums=(0, 1))(x, w)
    # dense oracle; grads w.r.t. the SORTED edge order the graph uses
    src_s, dst_s = np.asarray(g.src), np.asarray(g.dst)
    gx_ref = np.zeros((n, F))
    for k in range(e):
        gx_ref[src_s[k]] += float(np.asarray(w)[k]) * np.asarray(co)[dst_s[k]]
    gw_ref = np.sum(np.asarray(co)[dst_s] * np.asarray(x)[src_s], axis=1)
    np.testing.assert_allclose(np.asarray(gx), gx_ref, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), gw_ref, rtol=1e-3, atol=1e-3)


def test_mh_and_gat_chunked_match_unchunked():
    """Chunk-streamed multi-head paths (mh_spmm slot gather and the fused
    GAT attention) ≡ their single-shot results — the reddit2-scale OOM fix:
    only one chunk's [chunk_slots, H*D] gather is live at a time."""
    import dataclasses
    import numpy as np
    import jax
    import jax.numpy as jnp
    from geot_tpu.graph.plan import compute_chunks
    from geot_tpu.models.conv import prepare_graph
    from geot_tpu.ops import api as ops

    rng = np.random.default_rng(81)
    n, e, H, D = 120, 900, 4, 8
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    g = prepare_graph(src, dst, n, add_self_loops=True, e_tile=64, s_tile=64)
    ch = compute_chunks(np.asarray(g.plan.out_block), 3)
    assert len(ch) > 2
    g2 = dataclasses.replace(
        g,
        plan=dataclasses.replace(g.plan, chunks=ch),
        plan_t=dataclasses.replace(
            g.plan_t, chunks=compute_chunks(np.asarray(g.plan_t.out_block), 3)
        ),
    )
    xh = jnp.asarray(rng.standard_normal((n, H, D)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((len(g.src), H)).astype(np.float32))

    # mh_spmm fwd + grad
    import geot_tpu

    a = geot_tpu.mh_spmm(g.src, g.dst, w, xh, n, graph=g, backend="pallas")
    b = geot_tpu.mh_spmm(g.src, g.dst, w, xh, n, graph=g2, backend="pallas")
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4)
    co = jnp.asarray(rng.standard_normal(a.shape).astype(np.float32))
    ga = jax.grad(
        lambda xx: jnp.vdot(
            geot_tpu.mh_spmm(g.src, g.dst, w, xx, n, graph=g, backend="pallas"), co
        )
    )(xh)
    gb = jax.grad(
        lambda xx: jnp.vdot(
            geot_tpu.mh_spmm(g.src, g.dst, w, xx, n, graph=g2, backend="pallas"), co
        )
    )(xh)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga), rtol=1e-3, atol=1e-4)

    # fused GAT attention fwd + grad
    a_s = jnp.asarray(0.3 * rng.standard_normal((n, H)).astype(np.float32))
    a_d = jnp.asarray(0.3 * rng.standard_normal((n, H)).astype(np.float32))
    oa = ops.gat_attention_spmm(g, xh, a_s, a_d, backend="pallas")
    ob = ops.gat_attention_spmm(g2, xh, a_s, a_d, backend="pallas")
    np.testing.assert_allclose(np.asarray(ob), np.asarray(oa), rtol=1e-4, atol=1e-4)
    co2 = jnp.asarray(rng.standard_normal(oa.shape).astype(np.float32))
    ga = jax.grad(
        lambda *args: jnp.vdot(
            ops.gat_attention_spmm(g, *args, backend="pallas"), co2
        ),
        argnums=(0, 1, 2),
    )(xh, a_s, a_d)
    gb = jax.grad(
        lambda *args: jnp.vdot(
            ops.gat_attention_spmm(g2, *args, backend="pallas"), co2
        ),
        argnums=(0, 1, 2),
    )(xh, a_s, a_d)
    for x1, x2 in zip(ga, gb):
        np.testing.assert_allclose(
            np.asarray(x2), np.asarray(x1), rtol=1e-3, atol=1e-4
        )


def test_bucketed_bat_spmm_matches_reference(monkeypatch):
    """Bucketed BAT (src-bucket-sorted edges, sliced-table gather): fwd and
    grad ≡ reference through the Graph dispatch (static weights)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from geot_tpu.graph.plan import build_bucketed_bat_plan
    from geot_tpu.graph.structures import build_graph
    from geot_tpu.ops import api as ops
    from geot_tpu.ops import reference as ref

    monkeypatch.setenv("GEOT_BUCKET_TABLE_BYTES", "1")
    rng = np.random.default_rng(23)
    n, nnz, N = 700, 5000, 96
    dst = np.sort(rng.integers(0, n, nnz)).astype(np.int32)
    src = rng.integers(0, n, nnz).astype(np.int32)
    w = rng.standard_normal(nnz).astype(np.float32)
    g = build_graph(src, dst, n, edge_weight=w, assume_sorted=True)
    assert g.bat_b is not None
    # swap in small-bucket plans so multiple buckets + chunks are exercised
    import dataclasses
    bb = build_bucketed_bat_plan(src, dst, n, n, edge_weight=w,
                                 e_tile=64, s_tile=64, bucket_rows=160,
                                 max_chunk_tiles=6)
    # transpose: reduce over src, gather dst, weights in src order
    perm_t = np.argsort(src, kind="stable")
    bb_t = build_bucketed_bat_plan(
        dst[perm_t], src[perm_t], n, n, edge_weight=w[perm_t],
        e_tile=64, s_tile=64, bucket_rows=160, max_chunk_tiles=6,
    )
    g2 = dataclasses.replace(g, bat_b=bb, bat_b_t=bb_t)
    x = jnp.asarray(rng.standard_normal((n, N)).astype(np.float32))
    out = ops.segment_spmm(g2, x, backend="pallas")
    exp = ref.gather_weight_scatter_ref(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w), x, n
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(exp),
                               rtol=2e-3, atol=2e-3)
    co = jnp.asarray(rng.standard_normal(exp.shape).astype(np.float32))
    gx = jax.grad(
        lambda xx: jnp.vdot(ops.segment_spmm(g2, xx, backend="pallas"), co)
    )(x)
    gx_ref = jax.grad(
        lambda xx: jnp.vdot(
            ref.gather_weight_scatter_ref(
                jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w), xx, n
            ),
            co,
        )
    )(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=2e-3, atol=2e-3)


def test_segment_spmm_bf16_pallas_matches_f32():
    """bf16 activations through the Pallas plan paths (BAT static-weight
    kernel): f32 in-kernel accumulation keeps the result within bf16
    input-rounding tolerance of the f32 run; output dtype follows input."""
    rng = np.random.default_rng(42)
    n, e = 500, 6000
    src = rng.integers(0, n, e).astype(np.int32)
    dst = np.sort(rng.integers(0, n, e)).astype(np.int32)
    w = rng.standard_normal(e).astype(np.float32)
    g = build_graph(src, dst, n, edge_weight=w, feature_hint=64)
    x32 = rng.standard_normal((n, 64)).astype(np.float32)
    xbf = jnp.asarray(x32, jnp.bfloat16)
    out32 = geot_tpu.segment_spmm(g, jnp.asarray(x32), backend="pallas")
    outbf = geot_tpu.segment_spmm(g, xbf, backend="pallas")
    assert outbf.dtype == jnp.bfloat16
    scale = float(jnp.max(jnp.abs(out32))) + 1e-6
    err = float(jnp.max(jnp.abs(outbf.astype(jnp.float32) - out32)))
    assert err < 0.05 * scale, (err, scale)


def test_gather_scatter_bf16_pallas():
    rng = np.random.default_rng(43)
    n, e = 300, 4000
    src = rng.integers(0, n, e).astype(np.int32)
    dst = np.sort(rng.integers(0, n, e)).astype(np.int32)
    g = build_graph(src, dst, n, feature_hint=32)
    x32 = rng.standard_normal((n, 32)).astype(np.float32)
    out32 = geot_tpu.gather_scatter(g.src, g.dst, jnp.asarray(x32), n, graph=g,
                           backend="pallas")
    outbf = geot_tpu.gather_scatter(g.src, g.dst, jnp.asarray(x32, jnp.bfloat16), n,
                           graph=g, backend="pallas")
    assert outbf.dtype == jnp.bfloat16
    scale = float(jnp.max(jnp.abs(out32))) + 1e-6
    assert float(
        jnp.max(jnp.abs(outbf.astype(jnp.float32) - out32))
    ) < 0.05 * scale


def test_sddmm_bat_kernel_matches_reference():
    """Round-5 Pallas SDDMM (dst rows streamed as window blocks, one-hot
    MXU select; reference kernels `csrc/cuda/sddmm_coo_kernel.cuh:3-210`)
    vs the XLA reference, including through a chunked BAT plan."""
    import geot_tpu.ops.api as api
    from geot_tpu.graph.structures import build_graph

    rng = np.random.default_rng(5)
    n, nnz = 900, 20_000
    src = rng.integers(0, n, nnz).astype(np.int32)
    dst = rng.integers(0, n, nnz).astype(np.int32)
    g = build_graph(src, dst, n, layouts=("bat",))
    a = jnp.asarray(rng.standard_normal((n, 48)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((n, 48)).astype(np.float32))
    out = api._sddmm_bat_fwd(g.bat, a, b, g.src)
    from geot_tpu.ops import reference as ref

    want = ref.sddmm_coo_ref(g.src, g.dst, a, b)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


def test_gws_weight_grad_uses_sddmm_kernel(monkeypatch):
    """Dynamic-weight backward's dw runs the BAT SDDMM kernel on the
    accelerated path and still matches autodiff of the reference op."""
    import geot_tpu.ops.api as api
    from geot_tpu.models.conv import prepare_graph

    rng = np.random.default_rng(6)
    n, nnz = 700, 15_000
    src = rng.integers(0, n, nnz).astype(np.int32)
    dst = rng.integers(0, n, nnz).astype(np.int32)
    g = prepare_graph(src, dst, n, add_self_loops=False, layouts=("bat",))
    x = jnp.asarray(rng.standard_normal((n, 32)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(g.num_edges).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((n, 32)).astype(np.float32))

    def loss(w_, backend):
        out = api.gather_weight_scatter(
            g.src, g.dst, w_, x, n, graph=g, backend=backend
        )
        return jnp.vdot(out, cot)

    dw_pallas = jax.grad(lambda w_: loss(w_, "pallas"))(w)
    dw_ref = jax.grad(lambda w_: loss(w_, "reference"))(w)
    np.testing.assert_allclose(dw_pallas, dw_ref, rtol=2e-4, atol=2e-4)
