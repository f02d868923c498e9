"""Pallas TPU kernels: deterministic tiled sorted-segment reduction.

TPU-native replacement for GeoT's CUDA segment-reduce kernels
(`csrc/cuda/index_scatter_kernel.cuh:48-201` PR/SR schedules,
`csrc/cuda/gather_scatter_kernel.cuh`, `csrc/cuda/gather_weight_scatter_kernel.cuh`,
`csrc/cuda/mh_spmm_kernel.cuh`). Those kernels resolve inter-tile segment
overlap with atomicAdd; TPUs have no atomics, but Pallas grids execute
sequentially per core, so we instead:

  1. run over a `SegmentPlan` (see `geot_tpu.graph.plan`): fixed-size edge
     tiles, each confined to one aligned output window, ordered by window;
  2. reduce each tile on the MXU with a weighted one-hot matmul
     ``P = (onehot(local_seg_ids) * w) @ V`` — the TPU idiom for scatter-add;
  3. accumulate consecutive tiles of the same window in a float32 VMEM
     scratch and flush each output block exactly once (bit-deterministic —
     no atomics, no order nondeterminism, unlike the reference whose tests
     need atol=1e-4 *because* of atomics; SURVEY §5 "Race detection").

Two data layouts mirror GeoT's SR/PR schedule split
(`csrc/cuda/wrapper/index_scatter_rule.h:3-256`):

  * SR mode (wide features): V is [e_tile, f_tile] — features on lanes,
    edges on sublanes. One grid axis tiles the feature dim.
  * PR mode (narrow features, N ≲ 32): V is [n_pad, e_tile] — edges on
    lanes, features on sublanes; output is produced transposed
    [n_pad, segments] so the segment axis rides the 128-wide lanes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from geot_tpu.graph.plan import BatPlan, SegmentPlan

__all__ = [
    "plan_segment_sum_sr",
    "plan_segment_sum_sr_packed",
    "plan_segment_sum_pr",
    "plan_segment_sum_mh",
    "plan_segment_sum_sr2",
    "plan_segment_sum_packed2",
    "bat_segment_sum",
    "bat_segment_sum_packed",
    "stream_segment_sum",
    "default_interpret",
]


def default_interpret() -> bool:
    """Interpret Pallas kernels off-TPU (CPU tests exercise kernel logic)."""
    return jax.default_backend() != "tpu"


def _prec(dtype):
    """MXU precision policy for dots whose operands are NOT exactly
    representable in bf16. (Mosaic only lowers DEFAULT and HIGHEST.)"""
    if dtype == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


def _onehot_dot(onehot: jax.Array, v: jax.Array, swap: bool = False):
    """MXU product of an exactly-bf16-representable selector matrix with
    f32 values, in TWO single-pass bf16 matmuls (hi/lo split of the values,
    ~2^-16 relative accuracy) instead of HIGHEST's six passes — the one-hot
    entries are 0/1 so their bf16 cast is exact and needs no splitting.
    `swap=True` computes v @ onehot instead of onehot @ v."""
    if v.dtype != jnp.float32:
        a, b = (v, onehot.astype(v.dtype)) if swap else (onehot.astype(v.dtype), v)
        return jnp.dot(a, b, preferred_element_type=jnp.float32)
    oh = onehot.astype(jnp.bfloat16)
    hi = v.astype(jnp.bfloat16)
    lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    if swap:
        return jnp.dot(hi, oh, preferred_element_type=jnp.float32) + jnp.dot(
            lo, oh, preferred_element_type=jnp.float32
        )
    return jnp.dot(oh, hi, preferred_element_type=jnp.float32) + jnp.dot(
        oh, lo, preferred_element_type=jnp.float32
    )


def _sr_kernel(ob_ref, dst_ref, w_ref, v_ref, o_ref, acc_ref, *, s_tile):
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    cur = ob_ref[t]
    first = jnp.logical_or(t == 0, ob_ref[jnp.maximum(t - 1, 0)] != cur)
    last = jnp.logical_or(t == n_t - 1, ob_ref[jnp.minimum(t + 1, n_t - 1)] != cur)

    local = dst_ref[0, 0, :] - cur * s_tile  # [e_tile] in [0, s_tile)
    e_tile = local.shape[0]
    seg_ids = jax.lax.broadcasted_iota(jnp.int32, (s_tile, e_tile), 0)
    v = v_ref[:]
    # weight applied to the values on the VPU so the one-hot matmul operand
    # stays exactly representable in bf16 (enables the 3-pass HIGH path)
    vw = v * w_ref[0, 0, :][:, None].astype(v.dtype)
    onehot = (seg_ids == local[None, :]).astype(jnp.float32)
    part = _onehot_dot(onehot, vw)

    @pl.when(first)
    def _():
        acc_ref[:] = part

    @pl.when(jnp.logical_not(first))
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(last)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _pr_kernel(ob_ref, dst_ref, w_ref, v_ref, o_ref, acc_ref, *, s_tile):
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    cur = ob_ref[t]
    first = jnp.logical_or(t == 0, ob_ref[jnp.maximum(t - 1, 0)] != cur)
    last = jnp.logical_or(t == n_t - 1, ob_ref[jnp.minimum(t + 1, n_t - 1)] != cur)

    local = dst_ref[0, 0, :] - cur * s_tile  # [e_tile]
    e_tile = local.shape[0]
    seg_ids = jax.lax.broadcasted_iota(jnp.int32, (e_tile, s_tile), 1)
    v = v_ref[:]  # [n_pad, e_tile]
    vw = v * w_ref[0, 0, :][None, :].astype(v.dtype)
    onehot_t = (seg_ids == local[:, None]).astype(jnp.float32)
    part = _onehot_dot(onehot_t, vw, swap=True)  # [n_pad, s_tile]

    @pl.when(first)
    def _():
        acc_ref[:] = part

    @pl.when(jnp.logical_not(first))
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(last)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _mh_kernel(
    ob_ref, dst_ref, w_ref, v_ref, o_ref, acc_ref, *, s_tile, f_tile, head_dim
):
    """SR kernel with per-(edge, head) weights expanded to per-lane weights
    via a head-selector matmul (replaces the per-element head indexing of
    `csrc/cuda/mh_spmm_kernel.cuh:28-213`)."""
    f = pl.program_id(0)
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    cur = ob_ref[t]
    first = jnp.logical_or(t == 0, ob_ref[jnp.maximum(t - 1, 0)] != cur)
    last = jnp.logical_or(t == n_t - 1, ob_ref[jnp.minimum(t + 1, n_t - 1)] != cur)

    v = v_ref[:]  # [e_tile, f_tile]
    e_tile = v.shape[0]
    n_heads = w_ref.shape[1]
    # head of each lane in this feature tile
    lane = jax.lax.broadcasted_iota(jnp.int32, (n_heads, f_tile), 1)
    head_of_lane = (f * f_tile + lane) // head_dim
    head_ids = jax.lax.broadcasted_iota(jnp.int32, (n_heads, f_tile), 0)
    head_sel = (head_of_lane == head_ids).astype(jnp.float32)  # [H, f_tile]
    w_lane = _onehot_dot(
        head_sel, w_ref[:].astype(jnp.float32), swap=True
    )  # [e_tile, f_tile]

    local = dst_ref[0, 0, :] - cur * s_tile
    seg_ids = jax.lax.broadcasted_iota(jnp.int32, (s_tile, e_tile), 0)
    onehot = (seg_ids == local[None, :]).astype(jnp.float32)
    part = _onehot_dot(onehot, v * w_lane.astype(v.dtype))

    @pl.when(first)
    def _():
        acc_ref[:] = part

    @pl.when(jnp.logical_not(first))
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(last)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _sr_packed_kernel(
    ob_ref, dst_ref, w_ref, v_ref, o_ref, acc_ref, *, s_tile, pack, n_feat
):
    """SR layout for narrow features WITHOUT lane padding: `pack` = 128 //
    n_feat edges share each 128-lane row (edge r*pack+k occupies lanes
    [k*n, (k+1)*n) of row r — a free reshape of the [T*E, n] value matrix).
    The tile reduces with `pack` one-hot matmuls, one per sub-position.
    Replaces the PR layout, whose [N, T*E] global transpose measured far
    more expensive than it saves (see `_pick_mode`)."""
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    cur = ob_ref[t]
    first = jnp.logical_or(t == 0, ob_ref[jnp.maximum(t - 1, 0)] != cur)
    last = jnp.logical_or(t == n_t - 1, ob_ref[jnp.minimum(t + 1, n_t - 1)] != cur)

    rows = v_ref.shape[0]  # e_tile // pack
    # dst/w arrive k-major (sub-position k occupies [k*rows, (k+1)*rows) —
    # reordered at trace level; Mosaic cannot reshape 1-D vectors in-kernel)
    local = dst_ref[0, 0, :] - cur * s_tile  # [e_tile]
    w_all = w_ref[0, 0, :]
    v = v_ref[:]  # [rows, pack * n_feat]
    part = jnp.zeros((s_tile, n_feat), jnp.float32)
    seg_ids = jax.lax.broadcasted_iota(jnp.int32, (s_tile, rows), 0)
    for k in range(pack):
        lk = local[k * rows : (k + 1) * rows]
        wk = w_all[k * rows : (k + 1) * rows]
        onehot = (seg_ids == lk[None, :]).astype(jnp.float32)
        vk = v[:, k * n_feat : (k + 1) * n_feat] * wk[:, None].astype(v.dtype)
        part = part + _onehot_dot(onehot, vk)

    @pl.when(first)
    def _():
        acc_ref[:] = part

    @pl.when(jnp.logical_not(first))
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(last)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def plan_segment_sum_sr_packed(
    plan: SegmentPlan,
    vals_slots: jax.Array,  # [T*e_tile, n_feat] slot-ordered, n_feat | 128
    w_slots: jax.Array,  # [T, e_tile]
    *,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Packed-SR tiled segment sum for narrow features (n_feat divides 128
    and e_tile divisible by 128//n_feat). Returns [n_blocks*s_tile, n_feat].
    """
    if interpret is None:
        interpret = default_interpret()
    T, e_tile, s_tile = plan.num_tiles, plan.e_tile, plan.s_tile
    n_feat = vals_slots.shape[1]
    pack = 128 // n_feat
    assert 128 % n_feat == 0 and e_tile % pack == 0, (n_feat, e_tile)
    rows = e_tile // pack
    out_dtype = out_dtype or vals_slots.dtype
    v_packed = vals_slots.reshape(T * rows, 128)
    # k-major lane order for dst/w (see kernel comment)
    dst_km = (
        plan.dst_slots.reshape(T, rows, pack)
        .transpose(0, 2, 1)
        .reshape(T, 1, e_tile)
    )
    w_km = (
        w_slots.reshape(T, rows, pack).transpose(0, 2, 1).reshape(T, 1, e_tile)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, e_tile), lambda t, ob: (t, 0, 0)),
            pl.BlockSpec((1, 1, e_tile), lambda t, ob: (t, 0, 0)),
            pl.BlockSpec((rows, 128), lambda t, ob: (t, 0)),
        ],
        out_specs=pl.BlockSpec((s_tile, n_feat), lambda t, ob: (ob[t], 0)),
        scratch_shapes=[pltpu.VMEM((s_tile, n_feat), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(
            _sr_packed_kernel, s_tile=s_tile, pack=pack, n_feat=n_feat
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.n_blocks * s_tile, n_feat), out_dtype),
        interpret=interpret,
    )(
        plan.out_block,
        dst_km,
        w_km,
        v_packed,
    )


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# v2 kernels: aligned-edge-block (AEB) loaders
#
# The round-1 kernels consume values/weights in SLOT order, which forces the
# caller to materialize a slot-ordered copy: an XLA row gather for values
# (bandwidth-bound at the chip's ~350 GB/s streaming rate — acceptable only
# when a gather is semantically required, i.e. SpMM) and a catastrophic
# ~10 ms/M nnz *scalar* gather for per-call edge weights. The AEB loader
# instead reads values/weights directly from EDGE order (the caller's
# dst-sorted layout, reference `gather_weight_scatter_kernel.cuh:20-185`
# reads the same order in-kernel): the plan guarantees slot j of tile t is
# edge e0[t]+j, so the kernel fetches the two e_tile-aligned blocks covering
# [e0, e0+e_tile) via scalar-prefetch-driven index_maps and rolls them into
# slot alignment in VMEM. Block indices are clamped to the array tail; the
# wrapped rows a clamped roll produces land only on mask-0 slots.
# ---------------------------------------------------------------------------


def _aeb_load(a, b, e0, e_tile, n_blocks_arr, axis):
    """Concat the two aligned blocks and roll slot 0 to the front.

    axis=0: value blocks [e_tile, f] (sublane roll). axis=1: weight rows
    [1, e_tile] (lane roll). Returns the rolled 2x-extent array; caller
    slices the leading e_tile."""
    b0 = jnp.clip(e0 // e_tile, 0, n_blocks_arr - 2)
    shift = e0 - b0 * e_tile
    two = jnp.concatenate([a, b], axis=axis)
    return pltpu.roll(two, -shift, axis)


def _sr2_kernel(*refs, s_tile, e_tile, n_vblocks, n_full, v_aeb, w_dyn):
    ob_ref, e0_ref = refs[0], refs[1]
    i = 2
    dst_ref = refs[i]; i += 1
    wm_ref = refs[i]; i += 1
    tail_ref = None
    if v_aeb:
        vA_ref, vB_ref = refs[i], refs[i + 1]; i += 2
        if n_full < n_vblocks:  # ragged tail block passed separately
            tail_ref = refs[i]; i += 1
    else:
        v_ref = refs[i]; i += 1
    if w_dyn:
        wA_ref, wB_ref = refs[i], refs[i + 1]; i += 2
    o_ref, acc_ref = refs[i], refs[i + 1]

    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    cur = ob_ref[t]
    first = jnp.logical_or(t == 0, ob_ref[jnp.maximum(t - 1, 0)] != cur)
    last = jnp.logical_or(t == n_t - 1, ob_ref[jnp.minimum(t + 1, n_t - 1)] != cur)
    e0 = e0_ref[t]

    if v_aeb:
        b0 = jnp.clip(e0 // e_tile, 0, n_vblocks - 2)
        a, b = vA_ref[...], vB_ref[...]
        if tail_ref is not None:
            # logical blocks >= n_full live in the once-resident tail block
            # (avoids an O(nnz) pad-copy of the caller's value array)
            a = jnp.where(b0 >= n_full, tail_ref[...], a)
            b = jnp.where(b0 + 1 >= n_full, tail_ref[...], b)
        v = _aeb_load(a, b, e0, e_tile, n_vblocks, 0)[:e_tile]
    else:
        v = v_ref[:]
    if w_dyn:
        # dynamic per-edge weights, rolled from edge order; mask (wm) zeroes
        # padding slots so wrapped/garbage lanes never contribute
        wrow = _aeb_load(wA_ref[0], wB_ref[0], e0, e_tile, n_vblocks, 1)[0, :e_tile]
        w = wrow * wm_ref[0, 0, :]
    else:
        w = wm_ref[0, 0, :]

    local = dst_ref[0, 0, :] - cur * s_tile
    seg_ids = jax.lax.broadcasted_iota(jnp.int32, (s_tile, e_tile), 0)
    vw = v * w[:, None].astype(v.dtype)
    onehot = (seg_ids == local[None, :]).astype(jnp.float32)
    part = _onehot_dot(onehot, vw)

    @pl.when(first)
    def _():
        acc_ref[:] = part

    @pl.when(jnp.logical_not(first))
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(last)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def plan_segment_sum_sr2(
    plan: SegmentPlan,
    vals: jax.Array,
    *,
    vals_layout: str = "slot",  # 'slot' [T*E, F] | 'edge' [>=nnz rows, F]
    w_slots: Optional[jax.Array] = None,  # [T, e_tile] static slot weights
    w_edge: Optional[jax.Array] = None,  # [nnz] per-call edge weights
    f_tile: int = 128,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """SR tiled segment sum, v2: values from slot OR edge order, weights
    static (slot, premasked) or dynamic (edge order, rolled in-kernel).
    Returns [n_blocks*s_tile, F_pad]."""
    if interpret is None:
        interpret = default_interpret()
    T, e_tile, s_tile = plan.num_tiles, plan.e_tile, plan.s_tile
    assert plan.e0 is not None, "plan lacks e0 (rebuild with current builder)"
    v_aeb = vals_layout == "edge"
    w_dyn = w_edge is not None
    f_pad = vals.shape[1]
    assert f_pad % f_tile == 0, (f_pad, f_tile)
    n_f = f_pad // f_tile
    out_dtype = out_dtype or vals.dtype

    tail = None
    n_full = 0
    if v_aeb:
        if vals.shape[0] < 2 * e_tile:  # tiny input: one cheap pad
            vals = jnp.pad(vals, ((0, 2 * e_tile - vals.shape[0]), (0, 0)))
        rows = vals.shape[0]
        n_full = rows // e_tile
        rem = rows - n_full * e_tile
        n_vblocks = n_full + (1 if rem else 0)
        if rem:
            # ragged tail: copy only the last <e_tile rows into a separate
            # once-resident block instead of an O(nnz) pad of `vals`
            tail = jnp.pad(vals[n_full * e_tile :], ((0, e_tile - rem), (0, 0)))
    else:
        # >=: callers may over-gather tail rows for fast-emitter gather
        # sizes (api._fast_gather_fn); slot blocks beyond T are unaddressed
        assert vals.shape[0] >= T * e_tile, (vals.shape, T, e_tile)
        n_vblocks = plan.n_value_blocks or 2
        n_full = n_vblocks

    wm = w_slots if w_slots is not None else plan.mask
    b_clamp = n_vblocks - 2
    b_main = max(n_full - 1, 0)

    in_specs = [
        pl.BlockSpec((1, 1, e_tile), lambda f, t, ob, e0: (t, 0, 0)),
        pl.BlockSpec((1, 1, e_tile), lambda f, t, ob, e0: (t, 0, 0)),
    ]
    operands = [
        plan.dst_slots.reshape(T, 1, e_tile),
        wm.reshape(T, 1, e_tile),
    ]
    if v_aeb:
        in_specs += [
            pl.BlockSpec(
                (e_tile, f_tile),
                lambda f, t, ob, e0: (
                    jnp.minimum(jnp.clip(e0[t] // e_tile, 0, b_clamp), b_main),
                    f,
                ),
            ),
            pl.BlockSpec(
                (e_tile, f_tile),
                lambda f, t, ob, e0: (
                    jnp.minimum(
                        jnp.clip(e0[t] // e_tile, 0, b_clamp) + 1, b_main
                    ),
                    f,
                ),
            ),
        ]
        operands += [vals, vals]
        if tail is not None:
            in_specs += [
                pl.BlockSpec((e_tile, f_tile), lambda f, t, ob, e0: (0, f))
            ]
            operands += [tail]
    else:
        in_specs += [
            pl.BlockSpec((e_tile, f_tile), lambda f, t, ob, e0: (t, f))
        ]
        operands += [vals]
    if w_dyn:
        n_wrows = n_vblocks * e_tile
        w_pad = w_edge
        if w_pad.shape[0] < n_wrows:
            w_pad = jnp.pad(w_pad, (0, n_wrows - w_pad.shape[0]))
        w3 = w_pad[:n_wrows].reshape(n_vblocks, 1, e_tile).astype(jnp.float32)
        in_specs += [
            pl.BlockSpec(
                (1, 1, e_tile),
                lambda f, t, ob, e0: (jnp.clip(e0[t] // e_tile, 0, b_clamp), 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, e_tile),
                lambda f, t, ob, e0: (jnp.clip(e0[t] // e_tile, 0, b_clamp) + 1, 0, 0),
            ),
        ]
        operands += [w3, w3]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_f, T),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((s_tile, f_tile), lambda f, t, ob, e0: (ob[t], f)),
        scratch_shapes=[pltpu.VMEM((s_tile, f_tile), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(
            _sr2_kernel,
            s_tile=s_tile,
            e_tile=e_tile,
            n_vblocks=n_vblocks,
            n_full=n_full,
            v_aeb=v_aeb,
            w_dyn=w_dyn,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.n_blocks * s_tile, f_pad), out_dtype),
        interpret=interpret,
    )(plan.out_block, plan.e0, *operands)


def _packed2_kernel(*refs, s_tile, e_tile, pack, n_feat, n_vblocks, n_full, w_dyn):
    """Packed-SR with AEB value loading: values [rows, 128] in edge order
    (row r = edges r*pack..r*pack+pack-1 on lanes), rolled whole rows —
    the plan's pack_align guarantees e0 % pack == 0. dst/wm stay k-major
    slot order (precomputed); dynamic weights arrive r-major and are
    selected per sub-position with an exact strided one-hot dot."""
    ob_ref, e0_ref = refs[0], refs[1]
    i = 2
    dst_ref = refs[i]; i += 1
    wm_ref = refs[i]; i += 1
    vA_ref, vB_ref = refs[i], refs[i + 1]; i += 2
    tail_ref = None
    if n_full < n_vblocks:
        tail_ref = refs[i]; i += 1
    if w_dyn:
        wA_ref, wB_ref = refs[i], refs[i + 1]; i += 2
    o_ref, acc_ref = refs[i], refs[i + 1]

    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    cur = ob_ref[t]
    first = jnp.logical_or(t == 0, ob_ref[jnp.maximum(t - 1, 0)] != cur)
    last = jnp.logical_or(t == n_t - 1, ob_ref[jnp.minimum(t + 1, n_t - 1)] != cur)
    e0 = e0_ref[t]

    rows = e_tile // pack
    b0 = jnp.clip(e0 // e_tile, 0, n_vblocks - 2)
    shift_rows = (e0 - b0 * e_tile) // pack
    a, b = vA_ref[:], vB_ref[:]
    if tail_ref is not None:
        a = jnp.where(b0 >= n_full, tail_ref[:], a)
        b = jnp.where(b0 + 1 >= n_full, tail_ref[:], b)
    v2 = jnp.concatenate([a, b], axis=0)
    v = pltpu.roll(v2, -shift_rows, 0)[:rows]  # [rows, pack*n_feat]
    if w_dyn:
        w2 = jnp.concatenate([wA_ref[0], wB_ref[0]], axis=1)
        wr = pltpu.roll(w2, -(e0 - b0 * e_tile), 1)[:, :e_tile]  # [1, E] r-major

    local = dst_ref[0, 0, :] - cur * s_tile  # [e_tile] k-major
    w_all = wm_ref[0, 0, :]  # [e_tile] k-major (static w or mask)
    part = jnp.zeros((s_tile, n_feat), jnp.float32)
    seg_ids = jax.lax.broadcasted_iota(jnp.int32, (s_tile, rows), 0)
    for k in range(pack):
        lk = local[k * rows : (k + 1) * rows]
        wk = w_all[k * rows : (k + 1) * rows]
        if w_dyn:
            # sel[j, r] = 1 iff lane j holds sub-position k of row r
            j_ids = jax.lax.broadcasted_iota(jnp.int32, (e_tile, rows), 0)
            r_ids = jax.lax.broadcasted_iota(jnp.int32, (e_tile, rows), 1)
            sel = (j_ids == r_ids * pack + k).astype(jnp.float32)
            wdk = _onehot_dot(sel, wr, swap=True)[0]  # [rows]
            wk = wk * wdk  # k-major mask/static-weight times dynamic weight
        onehot = (seg_ids == lk[None, :]).astype(jnp.float32)
        vk = v[:, k * n_feat : (k + 1) * n_feat] * wk[:, None].astype(v.dtype)
        part = part + _onehot_dot(onehot, vk)

    @pl.when(first)
    def _():
        acc_ref[:] = part

    @pl.when(jnp.logical_not(first))
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(last)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def plan_segment_sum_packed2(
    plan: SegmentPlan,
    vals_edges: jax.Array,  # [>=nnz, n_feat] EDGE order, n_feat | 128
    *,
    w_slots: Optional[jax.Array] = None,  # [T, e_tile] k-major static weights
    w_edge: Optional[jax.Array] = None,  # [nnz] dynamic edge weights
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Packed-SR segment sum with AEB value loading for narrow features.
    Requires plan.pack_align % (128//n_feat) == 0. Returns
    [n_blocks*s_tile, n_feat]."""
    if interpret is None:
        interpret = default_interpret()
    T, e_tile, s_tile = plan.num_tiles, plan.e_tile, plan.s_tile
    assert plan.e0 is not None, "plan lacks e0"
    n_feat = vals_edges.shape[1]
    pack = 128 // n_feat
    assert 128 % n_feat == 0 and e_tile % pack == 0
    assert plan.pack_align % pack == 0, (plan.pack_align, pack)
    rows_tile = e_tile // pack
    out_dtype = out_dtype or vals_edges.dtype
    w_dyn = w_edge is not None

    # edge rows -> packed rows: [K*e_tile, n] -> [K*rows_tile, 128] is a
    # layout-free reshape; the ragged tail (< e_tile edges) goes into a
    # separate once-resident block instead of an O(nnz) pad-copy
    if vals_edges.shape[0] < 2 * e_tile:
        vals_edges = jnp.pad(
            vals_edges, ((0, 2 * e_tile - vals_edges.shape[0]), (0, 0))
        )
    rows = vals_edges.shape[0]
    n_full = rows // e_tile
    rem = rows - n_full * e_tile
    n_vblocks = n_full + (1 if rem else 0)
    if rows % pack == 0:
        # layout-free reshape of the whole array; the partial region past
        # the last full block is never indexed (b_main clamp)
        v_packed = vals_edges.reshape(rows // pack, 128)
    else:
        v_packed = vals_edges[: n_full * e_tile].reshape(n_full * rows_tile, 128)
    tail = None
    if rem:
        tail = jnp.pad(
            vals_edges[n_full * e_tile :], ((0, e_tile - rem), (0, 0))
        ).reshape(rows_tile, 128)
    b_clamp = n_vblocks - 2
    b_main = max(n_full - 1, 0)

    if w_slots is None and plan.mask_km is not None and plan.km_pack == pack:
        wm = plan.mask_km
    else:
        wm = _k_major(
            w_slots if w_slots is not None else plan.mask, T, e_tile, pack
        )
    if plan.dst_km is not None and plan.km_pack == pack:
        dst_km = plan.dst_km
    else:
        dst_km = _k_major(plan.dst_slots, T, e_tile, pack)

    in_specs = [
        pl.BlockSpec((1, 1, e_tile), lambda t, ob, e0: (t, 0, 0)),
        pl.BlockSpec((1, 1, e_tile), lambda t, ob, e0: (t, 0, 0)),
        pl.BlockSpec(
            (rows_tile, 128),
            lambda t, ob, e0: (
                jnp.minimum(jnp.clip(e0[t] // e_tile, 0, b_clamp), b_main),
                0,
            ),
        ),
        pl.BlockSpec(
            (rows_tile, 128),
            lambda t, ob, e0: (
                jnp.minimum(jnp.clip(e0[t] // e_tile, 0, b_clamp) + 1, b_main),
                0,
            ),
        ),
    ]
    operands = [dst_km, wm, v_packed, v_packed]
    if tail is not None:
        in_specs += [pl.BlockSpec((rows_tile, 128), lambda t, ob, e0: (0, 0))]
        operands += [tail]
    if w_dyn:
        n_wrows = n_vblocks * e_tile
        w_pad = w_edge
        if w_pad.shape[0] < n_wrows:
            w_pad = jnp.pad(w_pad, (0, n_wrows - w_pad.shape[0]))
        w3 = w_pad[:n_wrows].reshape(n_vblocks, 1, e_tile).astype(jnp.float32)
        in_specs += [
            pl.BlockSpec(
                (1, 1, e_tile),
                lambda t, ob, e0: (jnp.clip(e0[t] // e_tile, 0, b_clamp), 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, e_tile),
                lambda t, ob, e0: (jnp.clip(e0[t] // e_tile, 0, b_clamp) + 1, 0, 0),
            ),
        ]
        operands += [w3, w3]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((s_tile, n_feat), lambda t, ob, e0: (ob[t], 0)),
        scratch_shapes=[pltpu.VMEM((s_tile, n_feat), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(
            _packed2_kernel,
            s_tile=s_tile,
            e_tile=e_tile,
            pack=pack,
            n_feat=n_feat,
            n_vblocks=n_vblocks,
            n_full=n_full,
            w_dyn=w_dyn,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.n_blocks * s_tile, n_feat), out_dtype),
        interpret=interpret,
    )(plan.out_block, plan.e0, *operands)


def _k_major(arr: jax.Array, T: int, e_tile: int, pack: int) -> jax.Array:
    """Reorder a [T, e_tile] slot array so sub-position k of packed row r
    sits at lane k*rows + r (the packed kernel's lane layout)."""
    rows = e_tile // pack
    return (
        arr.reshape(T, rows, pack).transpose(0, 2, 1).reshape(T, 1, e_tile)
    )


# ---------------------------------------------------------------------------
# v3 kernels: block-aligned tiles (BAT)
#
# A tile is an (output window, value block) incidence (see
# `geot_tpu.graph.plan.BatPlan`). The kernel loads ONE raw e_tile-aligned
# block of the caller's dst-sorted per-edge arrays (values, dst ids,
# weights) — no gather, no roll, no slot layout, no per-tile index arrays —
# and reduces it into its window with the usual one-hot matmul. Edges of
# the block that belong to other windows (and the -1-padded phantom tail)
# produce window-local ids outside [0, s_tile) and match no one-hot row, so
# they drop out with zero masking cost. This is the TPU analogue of the
# reference kernels reading src/dst/weight straight from the edge list
# (`csrc/cuda/gather_weight_scatter_kernel.cuh:20-185`).
# ---------------------------------------------------------------------------


def _bat_kernel(*refs, s_tile, e_tile, n_full, has_w, has_tail):
    ob_ref, vb_ref = refs[0], refs[1]
    i = 2
    dst_ref = refs[i]; i += 1
    w_ref = None
    if has_w:
        w_ref = refs[i]; i += 1
    v_ref = refs[i]; i += 1
    tail_ref = None
    if has_tail:
        tail_ref = refs[i]; i += 1
    o_ref, acc_ref = refs[i], refs[i + 1]

    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    cur = ob_ref[t]
    first = jnp.logical_or(t == 0, ob_ref[jnp.maximum(t - 1, 0)] != cur)
    last = jnp.logical_or(t == n_t - 1, ob_ref[jnp.minimum(t + 1, n_t - 1)] != cur)

    v = v_ref[:]
    if tail_ref is not None:
        v = jnp.where(vb_ref[t] >= n_full, tail_ref[...], v)
    if w_ref is not None:
        v = v * w_ref[0, 0, :][:, None].astype(v.dtype)
    local = dst_ref[0, 0, :] - cur * s_tile  # out-of-window/-1 -> no match
    seg_ids = jax.lax.broadcasted_iota(jnp.int32, (s_tile, e_tile), 0)
    onehot = (seg_ids == local[None, :]).astype(jnp.float32)
    part = _onehot_dot(onehot, v)

    @pl.when(first)
    def _():
        acc_ref[:] = part

    @pl.when(jnp.logical_not(first))
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(last)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def bat_segment_sum(
    bp: BatPlan,
    vals: jax.Array,  # [>=nnz rows, F_pad] EDGE order (dst-sorted)
    w_edge: Optional[jax.Array] = None,  # [nnz] edge weights (any order = edge)
    *,
    f_tile: int = 128,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Wide BAT segment sum. Returns [n_blocks*s_tile, F_pad]."""
    if interpret is None:
        interpret = default_interpret()
    T, e_tile, s_tile = bp.num_tiles, bp.e_tile, bp.s_tile
    f_pad = vals.shape[1]
    assert f_pad % f_tile == 0, (f_pad, f_tile)
    n_f = f_pad // f_tile
    out_dtype = out_dtype or vals.dtype

    if vals.shape[0] < e_tile:
        vals = jnp.pad(vals, ((0, e_tile - vals.shape[0]), (0, 0)))
    rows = vals.shape[0]
    n_full = rows // e_tile
    rem = rows - n_full * e_tile
    tail = None
    if rem and n_full < bp.n_vblocks:
        # ragged tail: zero-padded copy of the last <e_tile rows, loaded
        # once — ragged Pallas block loads could surface NaN garbage that
        # survives 0*NaN in the one-hot dot
        tail = jnp.pad(vals[n_full * e_tile :], ((0, e_tile - rem), (0, 0)))
    has_tail = tail is not None
    b_main = max(n_full - 1, 0)

    in_specs = [
        pl.BlockSpec((1, 1, e_tile), lambda f, t, ob, vb: (vb[t], 0, 0)),
    ]
    operands = [bp.dst3]
    if w_edge is not None:
        # +1 block: sentinel (pad) tiles index one past the real blocks
        n_wrows = (bp.n_vblocks + 1) * e_tile
        w_pad = w_edge.astype(jnp.float32)
        if w_pad.shape[0] < n_wrows:
            w_pad = jnp.pad(w_pad, (0, n_wrows - w_pad.shape[0]))
        w3 = w_pad[:n_wrows].reshape(-1, 1, e_tile)
        in_specs += [
            pl.BlockSpec((1, 1, e_tile), lambda f, t, ob, vb: (vb[t], 0, 0))
        ]
        operands += [w3]
    in_specs += [
        pl.BlockSpec(
            (e_tile, f_tile),
            lambda f, t, ob, vb: (jnp.minimum(vb[t], b_main), f),
        )
    ]
    operands += [vals]
    if has_tail:
        in_specs += [pl.BlockSpec((e_tile, f_tile), lambda f, t, ob, vb: (0, f))]
        operands += [tail]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_f, T),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((s_tile, f_tile), lambda f, t, ob, vb: (ob[t], f)),
        scratch_shapes=[pltpu.VMEM((s_tile, f_tile), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(
            _bat_kernel,
            s_tile=s_tile,
            e_tile=e_tile,
            n_full=n_full,
            has_w=w_edge is not None,
            has_tail=has_tail,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bp.n_blocks * s_tile, f_pad), out_dtype),
        interpret=interpret,
    )(bp.out_block, bp.vblock, *operands)


def _bat_packed_kernel(*refs, s_tile, e_tile, pack, n_feat, n_full, has_w, has_tail):
    ob_ref, vb_ref = refs[0], refs[1]
    i = 2
    dst_ref = refs[i]; i += 1  # [1, 1, e_tile] k-major dst ids of the block
    w_ref = None
    if has_w:
        w_ref = refs[i]; i += 1  # [1, 1, e_tile] raw (r-major) weights
    v_ref = refs[i]; i += 1  # [rows_tile, 128] packed values
    tail_ref = None
    if has_tail:
        tail_ref = refs[i]; i += 1
    o_ref, acc_ref = refs[i], refs[i + 1]

    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    cur = ob_ref[t]
    first = jnp.logical_or(t == 0, ob_ref[jnp.maximum(t - 1, 0)] != cur)
    last = jnp.logical_or(t == n_t - 1, ob_ref[jnp.minimum(t + 1, n_t - 1)] != cur)

    rows = e_tile // pack
    v = v_ref[:]
    if tail_ref is not None:
        v = jnp.where(vb_ref[t] >= n_full, tail_ref[:], v)
    local = dst_ref[0, 0, :] - cur * s_tile  # k-major
    if w_ref is not None:
        wr = w_ref[0, 0, :][None, :]  # [1, e_tile] r-major
    part = jnp.zeros((s_tile, n_feat), jnp.float32)
    seg_ids = jax.lax.broadcasted_iota(jnp.int32, (s_tile, rows), 0)
    for k in range(pack):
        lk = local[k * rows : (k + 1) * rows]
        vk = v[:, k * n_feat : (k + 1) * n_feat]
        if w_ref is not None:
            # exact-ish strided lane-select of sub-position k's weights
            j_ids = jax.lax.broadcasted_iota(jnp.int32, (e_tile, rows), 0)
            r_ids = jax.lax.broadcasted_iota(jnp.int32, (e_tile, rows), 1)
            sel = (j_ids == r_ids * pack + k).astype(jnp.float32)
            wk = _onehot_dot(sel, wr, swap=True)[0]  # [rows]
            vk = vk * wk[:, None].astype(vk.dtype)
        onehot = (seg_ids == lk[None, :]).astype(jnp.float32)
        part = part + _onehot_dot(onehot, vk)

    @pl.when(first)
    def _():
        acc_ref[:] = part

    @pl.when(jnp.logical_not(first))
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(last)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def bat_segment_sum_packed(
    bp: BatPlan,
    vals: jax.Array,  # [>=nnz rows, n_feat] EDGE order, n_feat | 128
    w_edge: Optional[jax.Array] = None,
    *,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Packed BAT segment sum for narrow features (needs bp.dst_km built
    with km_pack == 128//n_feat). Returns [n_blocks*s_tile, n_feat]."""
    if interpret is None:
        interpret = default_interpret()
    T, e_tile, s_tile = bp.num_tiles, bp.e_tile, bp.s_tile
    n_feat = vals.shape[1]
    pack = 128 // n_feat
    assert 128 % n_feat == 0 and e_tile % pack == 0
    assert bp.dst_km is not None and bp.km_pack == pack, (bp.km_pack, pack)
    rows_tile = e_tile // pack
    out_dtype = out_dtype or vals.dtype

    if vals.shape[0] < e_tile:
        vals = jnp.pad(vals, ((0, e_tile - vals.shape[0]), (0, 0)))
    rows = vals.shape[0]
    n_full = rows // e_tile
    rem = rows - n_full * e_tile
    if rows % pack == 0:
        v_packed = vals.reshape(rows // pack, 128)
    else:
        v_packed = vals[: n_full * e_tile].reshape(n_full * rows_tile, 128)
    tail = None
    if rem and n_full < bp.n_vblocks:
        tail = jnp.pad(
            vals[n_full * e_tile :], ((0, e_tile - rem), (0, 0))
        ).reshape(rows_tile, 128)
    has_tail = tail is not None
    b_main = max(n_full - 1, 0)

    in_specs = [
        pl.BlockSpec((1, 1, e_tile), lambda t, ob, vb: (vb[t], 0, 0)),
    ]
    operands = [bp.dst_km.reshape(-1, 1, e_tile)]
    if w_edge is not None:
        # +1 block: sentinel (pad) tiles index one past the real blocks
        n_wrows = (bp.n_vblocks + 1) * e_tile
        w_pad = w_edge.astype(jnp.float32)
        if w_pad.shape[0] < n_wrows:
            w_pad = jnp.pad(w_pad, (0, n_wrows - w_pad.shape[0]))
        w3 = w_pad[:n_wrows].reshape(-1, 1, e_tile)
        in_specs += [
            pl.BlockSpec((1, 1, e_tile), lambda t, ob, vb: (vb[t], 0, 0))
        ]
        operands += [w3]
    in_specs += [
        pl.BlockSpec(
            (rows_tile, 128),
            lambda t, ob, vb: (jnp.minimum(vb[t], b_main), 0),
        )
    ]
    operands += [v_packed]
    if has_tail:
        in_specs += [pl.BlockSpec((rows_tile, 128), lambda t, ob, vb: (0, 0))]
        operands += [tail]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((s_tile, n_feat), lambda t, ob, vb: (ob[t], 0)),
        scratch_shapes=[pltpu.VMEM((s_tile, n_feat), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(
            _bat_packed_kernel,
            s_tile=s_tile,
            e_tile=e_tile,
            pack=pack,
            n_feat=n_feat,
            n_full=n_full,
            has_w=w_edge is not None,
            has_tail=has_tail,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bp.n_blocks * s_tile, n_feat), out_dtype),
        interpret=interpret,
    )(bp.out_block, bp.vblock, *operands)


# ---------------------------------------------------------------------------
# v4 kernel: output-stationary streaming (gather-free SpMM)
#
# Tiles are (output window, x block) cell incidences (see
# `geot_tpu.graph.stream_plan`). The kernel streams tile t's x block
# [x_rows, f_tile] through the Pallas pipeline (scalar-prefetch-driven
# BlockSpec — a sequential block DMA, never a row gather), selects each
# edge's source row with a src one-hot matmul on the MXU, and reduces into
# the VMEM-resident window accumulator with the usual dst one-hot. This is
# the TPU dual of the reference's rowcaching csr_gws kernel
# (`csrc/cuda/csr_gws_kernel.cuh:12-187`): fast-memory staging of operands
# next to compute instead of random global loads. Measured 3.8-5.1 ns/edge
# at fill >= 0.9 (probe_stream2) vs ~15 ns/edge for gather+BAT at products
# scale.
# ---------------------------------------------------------------------------


def _sddmm_bat_kernel(*refs, s_tile, n_full):
    """Per-edge dot out[e] = <a[dst[e]], b[e]> over BAT tiles: the a-side
    rows SHARE the tile's dst window, so they arrive as one streamed
    [s_tile, f] block and the per-edge selection is a one-hot MXU matmul —
    the gather half of XLA's fused SDDMM disappears (measured 9% of HBM
    peak at arxiv N=128, scratch_r5/campaign/sddmm.log; the reference
    instead hand-vectorizes both gathers, `csrc/cuda/sddmm_coo_kernel.cuh:
    3-210`). b values are pre-gathered edge-order rows (the same fast-size
    gather as the SpMM BAT path). Out-of-window and -1-pad edges match no
    one-hot row, so their a_sel row is zero and they contribute nothing —
    the per-TILE outputs are summed by value block afterwards (a cheap
    sorted segment-sum over [T, E] — vblock is non-decreasing across
    tiles), because Pallas does not guarantee output blocks survive
    non-consecutive revisits within one call."""
    ob_ref, vb_ref = refs[0], refs[1]
    dst_ref, a_ref, b_ref, o_ref, acc_ref = refs[2:7]

    t = pl.program_id(0)
    f = pl.program_id(1)
    n_f = pl.num_programs(1)
    cur = ob_ref[t]
    local = dst_ref[0, 0, :] - cur * s_tile  # [E]; -1/-OOW match no row
    e_tile = local.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (e_tile, s_tile), 1)
    sel = (row_ids == local[:, None]).astype(jnp.float32)
    a_sel = _onehot_dot(sel, a_ref[:])  # [E, f_tile] f32
    part = jnp.sum(a_sel * b_ref[:].astype(jnp.float32), axis=1)  # [E]

    @pl.when(f == 0)
    def _():
        acc_ref[0, :] = part

    @pl.when(f != 0)
    def _():
        acc_ref[0, :] = acc_ref[0, :] + part

    @pl.when(f == n_f - 1)
    def _():
        o_ref[0, 0, :] = acc_ref[0, :]


def sddmm_bat(
    bp,  # BatPlan over the dst-sorted edges
    a: jax.Array,  # [n_blocks*s_tile, f_pad] dst-side rows (padded)
    b_vals: jax.Array,  # [>= n_vblocks*e_tile, f_pad] edge-order src rows
    *,
    f_tile: int = 128,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Returns [(n_vblocks+1) * e_tile] f32 — per-edge dots in edge order
    (slot i of value block v at v*e_tile + i; the +1 sentinel block and
    pad slots are zero)."""
    if interpret is None:
        interpret = default_interpret()
    T, E, s_tile = bp.num_tiles, bp.e_tile, bp.s_tile
    f_pad = a.shape[1]
    assert f_pad % f_tile == 0 and b_vals.shape[1] == f_pad
    n_f = f_pad // f_tile
    n_full = b_vals.shape[0] // E
    b_main = max(n_full - 1, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T, n_f),  # f fastest: per-tile rowsum accumulates in scratch
        in_specs=[
            pl.BlockSpec((1, 1, E), lambda t, f, ob, vb: (vb[t], 0, 0)),
            pl.BlockSpec((s_tile, f_tile), lambda t, f, ob, vb: (ob[t], f)),
            pl.BlockSpec(
                (E, f_tile),
                lambda t, f, ob, vb: (jnp.minimum(vb[t], b_main), f),
            ),
        ],
        out_specs=pl.BlockSpec((1, 1, E), lambda t, f, ob, vb: (t, 0, 0)),
        scratch_shapes=[pltpu.VMEM((8, E), jnp.float32)],
    )
    parts = pl.pallas_call(
        functools.partial(_sddmm_bat_kernel, s_tile=s_tile, n_full=n_full),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, 1, E), jnp.float32),
        interpret=interpret,
    )(bp.out_block, bp.vblock, bp.dst3, a, b_vals)
    # combine the (<= windows-spanned) per-tile partials of each value
    # block: vblock is non-decreasing over tiles, so this is a sorted
    # segment-sum over [T, E] (sentinel tiles land in block n_vblocks)
    out = jax.ops.segment_sum(
        parts.reshape(T, E),
        jnp.minimum(bp.vblock, bp.n_vblocks),
        num_segments=bp.n_vblocks + 1,
        indices_are_sorted=True,
    )
    return out.reshape(-1)


def _stream_kernel(*refs, s_tile, x_rows, has_w, inout=False):
    ob_ref, sb_ref = refs[0], refs[1]
    i = 2
    dst_ref = refs[i]; i += 1
    srcl_ref = refs[i]; i += 1
    w_ref = None
    if has_w:
        w_ref = refs[i]; i += 1
    x_ref = refs[i]; i += 1
    oin_ref = None
    if inout:
        oin_ref = refs[i]; i += 1
    o_ref, acc_ref = refs[i], refs[i + 1]

    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    cur = ob_ref[t]
    first = jnp.logical_or(t == 0, ob_ref[jnp.maximum(t - 1, 0)] != cur)
    last = jnp.logical_or(t == n_t - 1, ob_ref[jnp.minimum(t + 1, n_t - 1)] != cur)

    srcl = srcl_ref[0, 0, :]  # [E] block-local src ids, -1 on padding
    e_tile = srcl.shape[0]
    # select: vals[E, f] = onehot(srcl)[E, x_rows] @ x_block[x_rows, f];
    # padding (-1) matches no column -> zero rows
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (e_tile, x_rows), 1)
    local = dst_ref[0, 0, :] - cur * s_tile  # -1 pads match no row
    seg_ids = jax.lax.broadcasted_iota(jnp.int32, (s_tile, e_tile), 0)
    if x_ref.dtype == jnp.bfloat16:
        # bf16 fast path (2 MXU passes instead of 4): the select output is
        # EXACT in bf16 (each vals row is one x row or zero), so the second
        # dot runs single-pass bf16 with the per-slot weight FOLDED INTO
        # the dst one-hot (w is bf16-rounded — within the bf16 pipeline's
        # error budget; accumulation stays f32 via preferred_element_type).
        sel = (col_ids == srcl[:, None]).astype(jnp.bfloat16)
        vals = jnp.dot(
            sel, x_ref[:], preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)
        if w_ref is not None:
            onehot_w = jnp.where(
                seg_ids == local[None, :], w_ref[0, 0, :][None, :], 0.0
            ).astype(jnp.bfloat16)
        else:
            onehot_w = (seg_ids == local[None, :]).astype(jnp.bfloat16)
        part = jnp.dot(onehot_w, vals, preferred_element_type=jnp.float32)
    else:
        sel = (col_ids == srcl[:, None]).astype(jnp.float32)
        vals = _onehot_dot(sel, x_ref[:])  # [E, f] f32
        if w_ref is not None:
            vals = vals * w_ref[0, 0, :][:, None]
        onehot = (seg_ids == local[None, :]).astype(jnp.float32)
        part = _onehot_dot(onehot, vals)

    @pl.when(first)
    def _():
        acc_ref[:] = part

    @pl.when(jnp.logical_not(first))
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(last)
    def _():
        if oin_ref is None:
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)
        else:
            # accumulate-into-carry mode: the output aliases the carry
            # buffer, so windows this plan never visits keep their prior
            # contents for free (no coverage tiles, no masking pass)
            o_ref[:] = (
                oin_ref[:].astype(jnp.float32) + acc_ref[:]
            ).astype(o_ref.dtype)


def stream_segment_acc(
    ob: jax.Array,  # [T] int32 GLOBAL window per tile, non-decreasing
    sb: jax.Array,  # [T] int32 x block per tile
    dst3: jax.Array,  # [T, 1, E] global dst ids, -1 pad
    srcl3: jax.Array,  # [T, 1, E] block-local src ids, -1 pad
    x: jax.Array,  # [n_xblocks*x_rows, f_pad]
    carry: jax.Array,  # [n_blocks*s_tile, f_pad] f32 accumulator
    w3: Optional[jax.Array] = None,
    *,
    s_tile: int,
    x_rows: int,
    f_tile: int = 128,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Gather-free streaming segment-sum that ACCUMULATES into `carry`
    (output aliases the carry input). This is how stream families and
    scan chunks combine: each call touches only the window blocks its
    tiles visit — sparse-window families cost nothing on the rest of the
    output (round-4; the previous full-buffer + mask combine paid ~2x on
    products-scale sparse families)."""
    if interpret is None:
        interpret = default_interpret()
    T = ob.shape[0]
    e_tile = dst3.shape[2]
    f_pad = x.shape[1]
    assert f_pad % f_tile == 0, (f_pad, f_tile)
    assert x.shape[0] % x_rows == 0, (x.shape, x_rows)
    assert carry.shape[1] == f_pad and carry.shape[0] % s_tile == 0, (
        carry.shape, f_pad, s_tile)
    n_f = f_pad // f_tile

    in_specs = [
        pl.BlockSpec((1, 1, e_tile), lambda f, t, ob, sb: (t, 0, 0)),
        pl.BlockSpec((1, 1, e_tile), lambda f, t, ob, sb: (t, 0, 0)),
    ]
    operands = [dst3, srcl3]
    if w3 is not None:
        in_specs += [pl.BlockSpec((1, 1, e_tile), lambda f, t, ob, sb: (t, 0, 0))]
        operands += [w3]
    in_specs += [
        pl.BlockSpec((x_rows, f_tile), lambda f, t, ob, sb: (sb[t], f)),
        pl.BlockSpec((s_tile, f_tile), lambda f, t, ob, sb: (ob[t], f)),
    ]
    operands += [x, carry]
    # alias the carry operand to the output; indices are over ALL flattened
    # inputs INCLUDING the two scalar-prefetch args
    carry_idx = 2 + len(operands) - 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_f, T),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((s_tile, f_tile), lambda f, t, ob, sb: (ob[t], f)),
        scratch_shapes=[pltpu.VMEM((s_tile, f_tile), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(
            _stream_kernel, s_tile=s_tile, x_rows=x_rows,
            has_w=w3 is not None, inout=True,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(carry.shape, carry.dtype),
        input_output_aliases={carry_idx: 0},
        interpret=interpret,
    )(ob, sb, *operands)


def stream_segment_sum(
    ob: jax.Array,  # [T] int32 window per tile (chunk-local if chunked)
    sb: jax.Array,  # [T] int32 x block per tile (global)
    dst3: jax.Array,  # [T, 1, E] dst ids (window-local base: ob*s_tile)
    srcl3: jax.Array,  # [T, 1, E] block-local src ids, -1 pad
    x: jax.Array,  # [n_xblocks*x_rows, f_pad]
    w3: Optional[jax.Array] = None,  # [T, 1, E] static slot weights
    *,
    s_tile: int,
    x_rows: int,
    n_blocks: int,
    f_tile: int = 128,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Gather-free streaming segment-sum over cell-sorted tiles.

    Returns [n_blocks*s_tile, f_pad]. Callers pass StreamPlan fields (or
    chunk slices of them — see `api._stream_sum_scan`)."""
    if interpret is None:
        interpret = default_interpret()
    T = ob.shape[0]
    e_tile = dst3.shape[2]
    f_pad = x.shape[1]
    assert f_pad % f_tile == 0, (f_pad, f_tile)
    assert x.shape[0] % x_rows == 0, (x.shape, x_rows)
    n_f = f_pad // f_tile
    out_dtype = out_dtype or x.dtype

    in_specs = [
        pl.BlockSpec((1, 1, e_tile), lambda f, t, ob, sb: (t, 0, 0)),
        pl.BlockSpec((1, 1, e_tile), lambda f, t, ob, sb: (t, 0, 0)),
    ]
    operands = [dst3, srcl3]
    if w3 is not None:
        in_specs += [pl.BlockSpec((1, 1, e_tile), lambda f, t, ob, sb: (t, 0, 0))]
        operands += [w3]
    in_specs += [
        pl.BlockSpec((x_rows, f_tile), lambda f, t, ob, sb: (sb[t], f)),
    ]
    operands += [x]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_f, T),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((s_tile, f_tile), lambda f, t, ob, sb: (ob[t], f)),
        scratch_shapes=[pltpu.VMEM((s_tile, f_tile), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(
            _stream_kernel, s_tile=s_tile, x_rows=x_rows, has_w=w3 is not None
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * s_tile, f_pad), out_dtype),
        interpret=interpret,
    )(ob, sb, *operands)


def plan_segment_sum_sr(
    plan: SegmentPlan,
    vals_slots: jax.Array,  # [T*e_tile, F_pad] slot-ordered edge values
    w_slots: jax.Array,  # [T, e_tile] per-slot scalar weight (0 on padding)
    *,
    f_tile: int = 128,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """SR-mode tiled segment sum. Returns [n_blocks*s_tile, F_pad]."""
    if interpret is None:
        interpret = default_interpret()
    T, e_tile, s_tile = plan.num_tiles, plan.e_tile, plan.s_tile
    f_pad = vals_slots.shape[1]
    # >=: callers may over-gather a few tail rows so the gather's index
    # count avoids the XLA slow-emitter sizes (api._fast_gather_fn); the
    # value grid never addresses rows past T*e_tile
    assert vals_slots.shape[0] >= T * e_tile, (vals_slots.shape, T, e_tile)
    assert f_pad % f_tile == 0, (f_pad, f_tile)
    n_f = f_pad // f_tile
    out_dtype = out_dtype or vals_slots.dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_f, T),
        in_specs=[
            pl.BlockSpec((1, 1, e_tile), lambda f, t, ob: (t, 0, 0)),
            pl.BlockSpec((1, 1, e_tile), lambda f, t, ob: (t, 0, 0)),
            pl.BlockSpec((e_tile, f_tile), lambda f, t, ob: (t, f)),
        ],
        out_specs=pl.BlockSpec((s_tile, f_tile), lambda f, t, ob: (ob[t], f)),
        scratch_shapes=[pltpu.VMEM((s_tile, f_tile), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_sr_kernel, s_tile=s_tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.n_blocks * s_tile, f_pad), out_dtype),
        interpret=interpret,
    )(
        plan.out_block,
        plan.dst_slots.reshape(T, 1, e_tile),
        w_slots.reshape(T, 1, e_tile),
        vals_slots,
    )


def plan_segment_sum_pr(
    plan: SegmentPlan,
    vals_slots_t: jax.Array,  # [N_pad, T*e_tile] transposed slot-ordered values
    w_slots: jax.Array,  # [T, e_tile]
    *,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """PR-mode tiled segment sum for narrow features.

    Returns the transposed result [N_pad, n_blocks*s_tile].
    """
    if interpret is None:
        interpret = default_interpret()
    T, e_tile, s_tile = plan.num_tiles, plan.e_tile, plan.s_tile
    n_pad = vals_slots_t.shape[0]
    assert vals_slots_t.shape[1] == T * e_tile
    out_dtype = out_dtype or vals_slots_t.dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, e_tile), lambda t, ob: (t, 0, 0)),
            pl.BlockSpec((1, 1, e_tile), lambda t, ob: (t, 0, 0)),
            pl.BlockSpec((n_pad, e_tile), lambda t, ob: (0, t)),
        ],
        out_specs=pl.BlockSpec((n_pad, s_tile), lambda t, ob: (0, ob[t])),
        scratch_shapes=[pltpu.VMEM((n_pad, s_tile), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_pr_kernel, s_tile=s_tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, plan.n_blocks * s_tile), out_dtype),
        interpret=interpret,
    )(
        plan.out_block,
        plan.dst_slots.reshape(T, 1, e_tile),
        w_slots.reshape(T, 1, e_tile),
        vals_slots_t,
    )


def plan_segment_sum_mh(
    plan: SegmentPlan,
    vals_slots: jax.Array,  # [T*e_tile, F_pad] with F_pad = H*head_dim padded
    w_heads: jax.Array,  # [T*e_tile, H] per-slot per-head weight (0 on padding)
    head_dim: int,
    *,
    f_tile: int = 128,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Multi-head SR segment sum: weight varies per (edge, head).

    head_dim must divide or be a multiple of f_tile so each lane's head is
    well-defined within a feature tile.
    """
    if interpret is None:
        interpret = default_interpret()
    T, e_tile, s_tile = plan.num_tiles, plan.e_tile, plan.s_tile
    f_pad = vals_slots.shape[1]
    f_tile = min(f_tile, f_pad)
    assert f_pad % f_tile == 0
    n_f = f_pad // f_tile
    n_heads = w_heads.shape[1]
    out_dtype = out_dtype or vals_slots.dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_f, T),
        in_specs=[
            pl.BlockSpec((1, 1, e_tile), lambda f, t, ob: (t, 0, 0)),
            pl.BlockSpec((e_tile, n_heads), lambda f, t, ob: (t, 0)),
            pl.BlockSpec((e_tile, f_tile), lambda f, t, ob: (t, f)),
        ],
        out_specs=pl.BlockSpec((s_tile, f_tile), lambda f, t, ob: (ob[t], f)),
        scratch_shapes=[pltpu.VMEM((s_tile, f_tile), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(
            _mh_kernel, s_tile=s_tile, f_tile=f_tile, head_dim=head_dim
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.n_blocks * s_tile, f_pad), out_dtype),
        interpret=interpret,
    )(
        plan.out_block,
        plan.dst_slots.reshape(T, 1, e_tile),
        w_heads,
        vals_slots,
    )
