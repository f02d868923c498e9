"""Multi-chip halo-exchange SpMM tests on the 8-device CPU mesh.

What the reference cannot test at all (it has no distributed layer,
SURVEY §2.7): numerical equality of the partitioned + all-to-all path
against the single-chip reference op, including gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from geot_tpu.ops import reference as ref
from geot_tpu.parallel import (
    block_nodes,
    halo_spmm,
    node_sharding,
    partition_graph,
    unblock_nodes,
)


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), ("parts",))


def _rand(seed, n_nodes=100, n_edges=600, f=16, weighted=True):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_nodes, n_edges).astype(np.int32)
    dst = rng.integers(0, n_nodes, n_edges).astype(np.int32)
    w = rng.standard_normal(n_edges).astype(np.float32) if weighted else None
    x = rng.standard_normal((n_nodes, f)).astype(np.float32)
    return src, dst, w, x


@pytest.mark.parametrize("nparts", [2, 4, 8])
@pytest.mark.parametrize("weighted", [False, True])
def test_halo_spmm_matches_reference(nparts, weighted):
    mesh = _mesh(nparts)
    src, dst, w, x = _rand(nparts, weighted=weighted)
    n = x.shape[0]
    pg = partition_graph(src, dst, n, nparts, edge_weight=w, e_tile=64, s_tile=64)
    xp = block_nodes(jnp.asarray(x), pg)
    xp = jax.device_put(xp, node_sharding(mesh))
    out = halo_spmm(xp, pg, mesh, backend="reference")
    expect = (
        ref.gather_weight_scatter_ref(src, dst, jnp.asarray(w), jnp.asarray(x), n)
        if weighted
        else ref.gather_scatter_ref(src, dst, jnp.asarray(x), n)
    )
    np.testing.assert_allclose(
        np.asarray(unblock_nodes(out, pg)), np.asarray(expect), rtol=1e-4, atol=1e-4
    )
    # blocked padding rows receive nothing
    from geot_tpu.parallel.halo_spmm import _block_index
    _, valid = _block_index(pg)
    assert np.all(np.asarray(out)[~valid] == 0)


def test_halo_spmm_pallas_interpret_matches():
    mesh = _mesh(4)
    src, dst, w, x = _rand(11)
    n = x.shape[0]
    pg = partition_graph(src, dst, n, 4, edge_weight=w, e_tile=64, s_tile=64)
    xp = jax.device_put(block_nodes(jnp.asarray(x), pg), node_sharding(mesh))
    out_p = halo_spmm(xp, pg, mesh, backend="pallas")
    out_r = halo_spmm(xp, pg, mesh, backend="reference")
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_r), rtol=1e-4, atol=1e-4
    )


def test_halo_spmm_grad_matches_reference():
    mesh = _mesh(4)
    src, dst, w, x = _rand(21, n_nodes=64, n_edges=300, f=8)
    n = x.shape[0]
    pg = partition_graph(src, dst, n, 4, edge_weight=w, e_tile=64, s_tile=64)
    xj = jnp.asarray(x)
    co = jnp.asarray(
        np.random.default_rng(0).standard_normal((n, 8)), dtype=jnp.float32
    )
    co_blocked = block_nodes(co, pg)

    def f_dist(xin):
        xp = jax.device_put(block_nodes(xin, pg), node_sharding(mesh))
        return jnp.vdot(halo_spmm(xp, pg, mesh, backend="reference"), co_blocked)

    def f_ref(xin):
        out = ref.gather_weight_scatter_ref(src, dst, jnp.asarray(w), xin, n)
        return jnp.vdot(out, co)

    g_dist = jax.grad(f_dist)(xj)
    g_ref = jax.grad(f_ref)(xj)
    np.testing.assert_allclose(np.asarray(g_dist), np.asarray(g_ref), rtol=1e-4, atol=1e-4)


def test_halo_spmm_under_jit():
    mesh = _mesh(4)
    src, dst, w, x = _rand(31, f=8)
    n = x.shape[0]
    pg = partition_graph(src, dst, n, 4, edge_weight=w, e_tile=64, s_tile=64)
    xp = jax.device_put(block_nodes(jnp.asarray(x), pg), node_sharding(mesh))

    @jax.jit
    def step(xin):
        return halo_spmm(xin, pg, mesh, backend="reference")

    out = step(xp)
    expect = ref.gather_weight_scatter_ref(src, dst, jnp.asarray(w), jnp.asarray(x), n)
    np.testing.assert_allclose(
        np.asarray(unblock_nodes(out, pg)), np.asarray(expect), rtol=1e-4, atol=1e-4
    )


def test_partition_empty_parts():
    """Parts with zero edges (all edges hit part 0) must still work."""
    mesh = _mesh(4)
    n = 80
    rng = np.random.default_rng(3)
    src = rng.integers(0, n, 200).astype(np.int32)
    dst = rng.integers(0, 20, 200).astype(np.int32)  # only part 0 dsts
    x = rng.standard_normal((n, 8)).astype(np.float32)
    pg = partition_graph(src, dst, n, 4, e_tile=32, s_tile=32)
    xp = jax.device_put(block_nodes(jnp.asarray(x), pg), node_sharding(mesh))
    out = halo_spmm(xp, pg, mesh, backend="reference")
    expect = ref.gather_scatter_ref(src, dst, jnp.asarray(x), n)
    np.testing.assert_allclose(
        np.asarray(unblock_nodes(out, pg)), np.asarray(expect), rtol=1e-4, atol=1e-4
    )


def test_interior_boundary_split():
    """Edges whose source is locally owned bypass the exchange: the interior
    plans carry them (comm/compute overlap, SURVEY §2.7), diagonal send
    slots are empty, and interior+boundary edge counts sum to nnz."""
    src, dst, w, x = _rand(7, n_nodes=120, n_edges=800)
    n = x.shape[0]
    P = 4
    pg = partition_graph(src, dst, n, P, edge_weight=w, e_tile=64, s_tile=64)
    starts = np.asarray(pg.part_start)
    owner = np.searchsorted(starts, np.arange(n), side="right") - 1
    n_int_expect = int(np.sum(owner[src] == owner[dst]))
    mask_int = np.asarray(pg.plan_int.mask)  # [P, T, E]
    mask_bnd = np.asarray(pg.plan.mask)
    assert int(mask_int.sum()) == n_int_expect
    assert int(mask_bnd.sum()) == len(src) - n_int_expect
    assert n_int_expect > 0  # random graph: some sources are local
    # diagonal send slots (self-sends) must be empty
    sm = np.asarray(pg.send_mask)
    for p in range(P):
        assert sm[p, p].sum() == 0.0
    # and the split result still matches the reference exactly
    mesh = _mesh(P)
    xp = jax.device_put(block_nodes(jnp.asarray(x), pg), node_sharding(mesh))
    out = halo_spmm(xp, pg, mesh, backend="reference")
    expect = ref.gather_weight_scatter_ref(
        src, dst, jnp.asarray(w), jnp.asarray(x), n
    )
    np.testing.assert_allclose(
        np.asarray(unblock_nodes(out, pg)), np.asarray(expect),
        rtol=1e-4, atol=1e-4,
    )


@pytest.mark.parametrize("weighted", [False, True])
def test_halo_spmm_bat_layout_matches_reference(weighted):
    """Scan-chunked BAT families (the products-scale layout, forced here
    via layout='bat' + a tiny chunk budget so every part runs a multi-chunk
    scan): forward equality against the single-chip reference."""
    mesh = _mesh(4)
    src, dst, w, x = _rand(31, n_nodes=150, n_edges=900, weighted=weighted)
    n = x.shape[0]
    pg = partition_graph(
        src, dst, n, 4, edge_weight=w, s_tile=32,
        layout="bat", bat_e_tile=32, max_chunk_tiles=4,
    )
    assert pg.bat is not None and pg.plan is None
    assert pg.bat.C >= 2  # the tiny budget actually forces multiple chunks
    xp = jax.device_put(block_nodes(jnp.asarray(x), pg), node_sharding(mesh))
    expect = (
        ref.gather_weight_scatter_ref(src, dst, jnp.asarray(w), jnp.asarray(x), n)
        if weighted
        else ref.gather_scatter_ref(src, dst, jnp.asarray(x), n)
    )
    for backend in ("reference", "pallas"):
        out = halo_spmm(xp, pg, mesh, backend=backend)
        np.testing.assert_allclose(
            np.asarray(unblock_nodes(out, pg)), np.asarray(expect),
            rtol=1e-4, atol=1e-4, err_msg=backend,
        )


def test_halo_spmm_bat_layout_grad_matches():
    """Backward through the BAT families (transpose plans + reverse
    exchange) vs jax.grad of the reference op."""
    mesh = _mesh(4)
    src, dst, w, x = _rand(33, n_nodes=96, n_edges=500, f=8)
    n = x.shape[0]
    pg = partition_graph(
        src, dst, n, 4, edge_weight=w, s_tile=32,
        layout="bat", bat_e_tile=32, max_chunk_tiles=4,
    )
    xp = jax.device_put(block_nodes(jnp.asarray(x), pg), node_sharding(mesh))
    cot = np.random.default_rng(0).standard_normal(xp.shape).astype(np.float32)
    cot_b = jax.device_put(jnp.asarray(cot), node_sharding(mesh))

    def loss_dist(xx):
        return jnp.vdot(halo_spmm(xx, pg, mesh, backend="pallas"), cot_b)

    g_dist = unblock_nodes(jax.grad(loss_dist)(xp), pg)

    cot_g = unblock_nodes(jnp.asarray(cot), pg)

    def loss_ref(xx):
        return jnp.vdot(
            ref.gather_weight_scatter_ref(src, dst, jnp.asarray(w), xx, n),
            cot_g,
        )

    g_ref = jax.grad(loss_ref)(jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(g_dist), np.asarray(g_ref), rtol=1e-4, atol=1e-4
    )


def test_partition_auto_selects_bat_past_budget(monkeypatch):
    """layout='auto' flips to the BAT families when the slot gather
    transient would blow the budget (products-scale guard, without
    products-scale memory in a unit test)."""
    import geot_tpu.parallel.partition as part_mod

    src, dst, w, x = _rand(35, n_nodes=80, n_edges=400)
    # pretend features are enormous so gather_bytes crosses the 1 GiB cap
    pg = partition_graph(
        src, dst, x.shape[0], 4, edge_weight=w,
        feature_hint=1 << 26, max_chunk_tiles=4,
    )
    assert pg.bat is not None and pg.plan is None


def test_interior_reduce_independent_of_exchange():
    """Comm/compute overlap precondition, checked structurally: in the
    forward jaxpr the interior-reduce operand of the final add must not
    be a descendant of the all_to_all — XLA can only schedule the
    exchange concurrently with work that does not consume it. (Observing
    the actual TPU schedule needs a multi-chip profile; this pins the
    necessary condition so a refactor cannot silently serialize it.)"""
    mesh = _mesh(4)
    src, dst, w, x = _rand(41, n_nodes=100, n_edges=500)
    n = x.shape[0]
    pg = partition_graph(src, dst, n, 4, edge_weight=w, e_tile=64, s_tile=64)
    xp = jax.device_put(block_nodes(jnp.asarray(x), pg), node_sharding(mesh))
    jaxpr = jax.make_jaxpr(
        lambda xx: halo_spmm(xx, pg, mesh, backend="reference")
    )(xp)

    def find_shard_map(jpr):
        for eqn in jpr.eqns:
            if eqn.primitive.name == "shard_map":
                return eqn.params["jaxpr"]
            for v in eqn.params.values():
                inner = getattr(v, "jaxpr", v)
                if hasattr(inner, "eqns"):
                    r = find_shard_map(inner)
                    if r is not None:
                        return r
        return None

    inner = find_shard_map(jaxpr.jaxpr)
    assert inner is not None, "no shard_map in the forward jaxpr"
    inner = getattr(inner, "jaxpr", inner)
    # taint-propagate from the all_to_all outputs
    tainted = set()
    saw_a2a = False
    for eqn in inner.eqns:
        name = eqn.primitive.name
        if "all_to_all" in name:
            saw_a2a = True
            tainted.update(map(id, eqn.outvars))
            continue
        if any(id(v) in tainted for v in eqn.invars if hasattr(v, "aval")):
            tainted.update(map(id, eqn.outvars))
    assert saw_a2a, "no all_to_all found inside shard_map"
    final = inner.eqns[-1]
    assert final.primitive.name in ("add", "add_any"), final.primitive.name
    taint_flags = [id(v) in tainted for v in final.invars]
    # exactly one side (the boundary reduce) depends on the exchange
    assert taint_flags.count(False) >= 1, (
        "interior reduce depends on the all_to_all — overlap impossible"
    )
    assert taint_flags.count(True) >= 1  # sanity: boundary side IS tainted


def _clustered_parts(n, P, intra, cross, seed=0):
    """Part-aligned communities: intra edges dense in (dst-window, src
    part-block) cells so the per-part census accepts streaming."""
    rng = np.random.default_rng(seed)
    npp = n // P
    p_of = rng.integers(0, P, intra)
    dst_i = p_of * npp + rng.integers(0, npp, intra)
    src_i = p_of * npp + rng.integers(0, npp, intra)
    dst_c = rng.integers(0, n, cross)
    src_c = rng.integers(0, n, cross)
    src = np.concatenate([src_i, src_c]).astype(np.int32)
    dst = np.concatenate([dst_i, dst_c]).astype(np.int32)
    return src, dst


@pytest.mark.parametrize("nparts", [2, 4, 8])
def test_halo_spmm_hybrid_layout_matches_reference(nparts):
    """layout='hybrid' (VERDICT r4 Next #5): interior dense cells stream
    gather-free from the local shard; the residue and boundary edges ride
    the BAT families. Exactness fwd vs the single-chip reference."""
    mesh = _mesh(nparts)
    n = 512
    src, dst = _clustered_parts(n, nparts, 12_000, 1_200, seed=41)
    rng = np.random.default_rng(42)
    w = rng.standard_normal(len(src)).astype(np.float32)
    x = rng.standard_normal((n, 16)).astype(np.float32)
    pg = partition_graph(
        src, dst, n, nparts, edge_weight=w, s_tile=32,
        layout="hybrid", bat_e_tile=256, max_chunk_tiles=8,
    )
    assert pg.stream_int is not None, (
        "per-part census rejected streaming on a part-aligned clustered graph"
    )
    xp = jax.device_put(block_nodes(jnp.asarray(x), pg), node_sharding(mesh))
    expect = ref.gather_weight_scatter_ref(
        src, dst, jnp.asarray(w), jnp.asarray(x), n
    )
    for backend in ("reference", "pallas"):
        out = halo_spmm(xp, pg, mesh, backend=backend)
        np.testing.assert_allclose(
            np.asarray(unblock_nodes(out, pg)), np.asarray(expect),
            rtol=1e-4, atol=1e-4, err_msg=backend,
        )


def test_halo_spmm_hybrid_layout_grad_matches():
    mesh = _mesh(4)
    n = 512
    src, dst = _clustered_parts(n, 4, 12_000, 1_200, seed=43)
    rng = np.random.default_rng(44)
    w = rng.standard_normal(len(src)).astype(np.float32)
    x = rng.standard_normal((n, 8)).astype(np.float32)
    pg = partition_graph(
        src, dst, n, 4, edge_weight=w, s_tile=32,
        layout="hybrid", bat_e_tile=256, max_chunk_tiles=8,
    )
    assert pg.stream_int is not None
    xp = jax.device_put(block_nodes(jnp.asarray(x), pg), node_sharding(mesh))
    cot = rng.standard_normal(xp.shape).astype(np.float32)
    cot_b = jax.device_put(jnp.asarray(cot), node_sharding(mesh))

    def loss_dist(xx):
        return jnp.vdot(halo_spmm(xx, pg, mesh, backend="pallas"), cot_b)

    g_dist = unblock_nodes(jax.grad(loss_dist)(xp), pg)
    cot_g = unblock_nodes(jnp.asarray(cot), pg)

    def loss_ref(xx):
        return jnp.vdot(
            ref.gather_weight_scatter_ref(src, dst, jnp.asarray(w), xx, n),
            cot_g,
        )

    g_ref = jax.grad(loss_ref)(jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(g_dist), np.asarray(g_ref), rtol=1e-4, atol=1e-4
    )
