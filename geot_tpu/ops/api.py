"""Public op API: GeoT's op surface, TPU-native.

Parity with the reference Python op layer (`geot/__init__.py:4-9,21`):

  index_scatter          — `geot/index_scatter.py:5-8`
  gather_scatter         — `geot/gather_scatter.py:7-39`
  gather_weight_scatter  — `geot/gather_weight_scatter.py:4-51`
  csr_gws                — `geot/csr_gws.py:3-37`
  mh_spmm / mh_spmm_transposed — `geot/mh_spmm.py:4-12`
  sddmm_coo              — `csrc/cuda/sddmm_coo_kernel.cuh`
  segment_spmm           — model-facing fused SpMM over a prebuilt Graph

Differences forced by XLA semantics (documented deviations):
  * `num_segments` is a static argument — GeoT sizes outputs from
    `index[-1]+1` at runtime (`csrc/index_scatter.cpp:15`), which cannot be
    a traced value on TPU.
  * The fast path runs over a precomputed `SegmentPlan` (one-time, like
    GeoT's coo_to_csr format transform); raw index ops without a plan use
    the XLA reference backend.
  * Backward never re-sorts edges: the transpose plan + permutation are
    precomputed (GeoT re-sorts per backward call,
    `geot/gather_weight_scatter.py:41`).

Autograd mirrors the reference registrations (`torch.library.register_autograd`):
  gather_scatter bwd   = transpose gather_scatter           (`geot/gather_scatter.py:26-37`)
  gather_weight_scatter bwd = (transpose gws, SDDMM)        (`geot/gather_weight_scatter.py:36-49`)
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

from geot_tpu.graph.plan import BatPlan, SegmentPlan
from geot_tpu.graph.structures import Graph
from geot_tpu.ops import reference as ref
from geot_tpu.ops.pallas_segment import (
    plan_segment_sum_sr,
    plan_segment_sum_sr_packed,
    plan_segment_sum_pr,
    plan_segment_sum_mh,
    plan_segment_sum_sr2,
    plan_segment_sum_packed2,
    bat_segment_sum,
    bat_segment_sum_packed,
)

__all__ = [
    "index_scatter",
    "gather_scatter",
    "gather_weight_scatter",
    "csr_gws",
    "mh_spmm",
    "mh_spmm_transposed",
    "sddmm_coo",
    "segment_softmax",
    "segment_spmm",
    "segment_counts",
    "gat_attention_spmm",
]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_mode(n_features: int, plan: SegmentPlan) -> str:
    """SR puts features on lanes; PR puts edges on lanes (reference splits
    the same way at feature_size<8, `csrc/cuda/wrapper/index_scatter_rule.h`).
    PR requires a [N, T*E] global transpose of the gathered values, which
    fence-verified timing showed costs far more than SR's lane padding
    saves (arxiv N=32: PR 55ms vs SR ~15ms vs XLA 12.6ms) — so auto mode
    is SR-only and PR runs only via an explicit tuning `mode_hint` from a
    fence-timed sweep. A packed-SR layout (p=128/N edges per lane row, p
    one-hot matmuls) is the planned replacement for narrow N."""
    pr_legal = plan.s_tile % 128 == 0 and n_features <= 128
    if plan.mode_hint == "pr" and pr_legal:
        return "pr"
    return "sr"


def _pick_f_tile(n_features: int) -> int:
    return 256 if (n_features % 256 == 0 and n_features >= 256) else 128


def _use_pallas(backend: str) -> bool:
    if backend == "pallas":
        return True
    if backend == "reference":
        return False
    # auto: pallas on TPU; reference elsewhere (interpret mode is test-only)
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# forward engine (not differentiable by itself)
# ---------------------------------------------------------------------------


import dataclasses as _dc


def _chunk_plan(plan, c):
    """Slice a chunk out of a plan (output rows shift to 0). With uniform
    chunks the kernel output spans `chunk_blocks` padded windows — every
    chunk then has identical shapes (ONE compiled kernel) and
    `num_segments` trims back to the chunk's real rows."""
    t0, t1, w0, w1 = c
    if isinstance(plan, BatPlan):
        s = plan.s_tile
        nb = plan.chunk_blocks or (w1 - w0)
        return _dc.replace(
            plan,
            out_block=plan.out_block[t0:t1] - w0,
            vblock=plan.vblock[t0:t1],
            n_blocks=nb,
            num_segments=min(
                max(plan.num_segments - w0 * s, 0), (w1 - w0) * s
            ),
            chunks=(),
            chunk_blocks=0,
        )
    s = plan.s_tile
    nb = plan.chunk_blocks or (w1 - w0)
    return _dc.replace(
        plan,
        src_slots=plan.src_slots[t0:t1],
        dst_slots=plan.dst_slots[t0:t1] - w0 * s,
        edge_pos=plan.edge_pos[t0:t1],
        mask=plan.mask[t0:t1],
        out_block=plan.out_block[t0:t1] - w0,
        e0=None if plan.e0 is None else plan.e0[t0:t1],
        dst_km=None if plan.dst_km is None else plan.dst_km[t0:t1] - w0 * s,
        mask_km=None if plan.mask_km is None else plan.mask_km[t0:t1],
        n_blocks=nb,
        num_segments=min(max(plan.num_segments - w0 * s, 0), (w1 - w0) * s),
        chunks=(),
        chunk_blocks=0,
    )


def _packed_width(n: int) -> int:
    """Smallest divisor of 128 that fits n (packed-SR lane width), or 0 if
    n needs the full-width SR path."""
    for d in (8, 16, 32, 64):
        if n <= d:
            return d
    return 0


def _plan_sum_one(plan: SegmentPlan, vals_slots: jax.Array, w_slots: jax.Array, mode):
    n = vals_slots.shape[1]
    if mode == "pr":
        n_pad = _round_up(max(n, 1), 8)
        v_t = vals_slots.T
        if n_pad != n:
            v_t = jnp.pad(v_t, ((0, n_pad - n), (0, 0)))
        out_t = plan_segment_sum_pr(plan, v_t, w_slots)
        return out_t[:n, : plan.num_segments].T
    # narrow features: packed-SR (p = 128//n edges per lane row) avoids the
    # 128-lane padding that multiplies traffic by 128/n
    nw = _packed_width(n)
    if 0 < nw < 128 and plan.e_tile % (128 // nw) == 0:
        v = vals_slots
        if nw != n:
            v = jnp.pad(v, ((0, 0), (0, nw - n)))
        out = plan_segment_sum_sr_packed(plan, v, w_slots)
        return out[: plan.num_segments, :n]
    f_tile = _pick_f_tile(n)
    f_pad = _round_up(max(n, 1), f_tile)
    v = vals_slots
    if f_pad != n:
        v = jnp.pad(v, ((0, 0), (0, f_pad - n)))
    out = plan_segment_sum_sr(plan, v, w_slots, f_tile=f_tile)
    return out[: plan.num_segments, :n]


def _plan_sum_chunked(plan: SegmentPlan, run_one):
    """Chunked tiled segment sum: `run_one(chunk_plan, t0, t1, token)`
    computes one chunk's trimmed output [chunk_segments, n]. `token` (the
    chunk-before-last's output, or None) must gate any large gather inside
    `run_one` via `lax.optimization_barrier` — depth-2 pipelining keeps at
    most two chunks live while gather and kernel overlap; without the gate
    XLA schedules every chunk's multi-GB gather concurrently."""
    if not plan.chunks:
        return run_one(plan, 0, plan.num_tiles, 0, None)
    outs = []
    for c in plan.chunks:
        cp = _chunk_plan(plan, c)
        token = outs[-2] if len(outs) >= 2 else None
        outs.append(run_one(cp, c[0], c[1], c[2], token))
    # stitch chunk outputs: consecutive chunks that split a hub window
    # mid-window share that boundary window — add-combine the overlap
    s = plan.s_tile
    pieces = []
    prev_w1 = None
    for (t0, t1, w0, w1), o in zip(plan.chunks, outs):
        if prev_w1 is not None and w0 < prev_w1:
            assert w0 == prev_w1 - 1, "chunks may only overlap one window"
            last = pieces.pop()
            ov = min(s, o.shape[0], last.shape[0])
            last = last.at[-ov:].add(o[:ov])
            pieces.append(last)
            if o.shape[0] > ov:
                pieces.append(o[ov:])
        else:
            pieces.append(o)
        prev_w1 = w1
    return jnp.concatenate(pieces, axis=0)[: plan.num_segments]


def _plan_sum_gather(plan: SegmentPlan, gather_fn, w_slots: jax.Array, n: int):
    """Tiled segment sum over slot-ordered values: `gather_fn(lo, hi, token)`
    returns the slot values [hi-lo, n] for slot rows [lo, hi) — called per
    chunk so only one chunk's gather is ever materialized (plan.chunks is
    built at graph-build time to bound that size)."""
    mode = _pick_mode(n, plan)

    def run_one(cp, t0, t1, w0, token):
        vals = gather_fn(t0 * plan.e_tile, t1 * plan.e_tile, token)
        return _plan_sum_one(cp, vals, w_slots[t0:t1], mode)

    return _plan_sum_chunked(plan, run_one)


def _gated(x: jax.Array, token) -> jax.Array:
    """Sequence a chunk's gather after the previous chunk's output."""
    if token is None:
        return x
    return jax.lax.optimization_barrier((x, token))[0]


def _fast_gather_fn(x: jax.Array, srcs: jax.Array, n: int):
    """Slot-row gather function for `_plan_sum_gather` that avoids the XLA
    gather emitter's slow sizes: a materialized row gather runs ~11 ns/row
    when the index count is divisible by 1024 and ~5 ns/row otherwise
    (measured, scratch_r5/rest{6,7,8}.log), so 1024-divisible requests are
    rounded up to an odd multiple of 512 — the wide-SR kernel ignores the
    extra tail rows. Packed (narrow-feature) kernels reshape rows and keep
    exact sizes."""
    srcs_flat = srcs.reshape(-1)
    if _packed_width(n) != 0:
        return lambda lo, hi, tok: _gated(x, tok)[srcs_flat[lo:hi]]
    srcs_pad = jnp.pad(srcs_flat, (0, 512))

    def g(lo, hi, tok):
        size = hi - lo
        if size % 1024 == 0:
            size += 512
        return _gated(x, tok)[srcs_pad[lo : lo + size]]

    return g


def _plan_sum(plan: SegmentPlan, vals_slots: jax.Array, w_slots: jax.Array):
    """Tiled segment sum of pre-gathered slot-ordered values [T*E, N]."""
    n = vals_slots.shape[1]
    return _plan_sum_gather(
        plan, lambda lo, hi, tok: vals_slots[lo:hi], w_slots, n
    )


def _aeb_packed_ok(plan: SegmentPlan, n: int) -> int:
    """Packed lane width for the AEB kernels, or 0 if the wide path must
    run (plan alignment or feature width unsuitable)."""
    nw = _packed_width(n)
    if not (0 < nw < 128) or plan.e0 is None:
        return 0
    pack = 128 // nw
    if plan.e_tile % pack or plan.pack_align % pack:
        return 0
    if plan.e_tile // pack < 8:
        return 0  # Mosaic needs >=8 sublanes per value block
    return nw


def _aeb_sum(
    plan: SegmentPlan,
    vals_fn,
    n: int,
    w_edge: Optional[jax.Array] = None,
    w_slots: Optional[jax.Array] = None,
):
    """Tiled segment sum over EDGE-ordered values via the aligned-edge-block
    kernels (`plan_segment_sum_sr2` / `plan_segment_sum_packed2`): no slot
    gather, no runtime weight permutation. `vals_fn(eA, size, token)` returns
    the value rows for edges [eA, eA+size) (eA traced, e_tile-aligned;
    size static) — the whole array when size covers it. Weights: `w_edge`
    (per-call, edge order) and/or `w_slots` ([T, e_tile] premasked static).
    """
    assert plan.e0 is not None
    E = plan.e_tile
    nw = _aeb_packed_ok(plan, n)

    def run_one(cp, t0, t1, w0, token):
        if t0 == 0 and t1 == plan.num_tiles:
            eA = None  # whole-plan call: global e0, full arrays
            size = plan.num_edges
            cpp = cp
        else:
            # rebase the chunk to a local edge window so only its slice of
            # the values is ever materialized by vals_fn
            eA = (cp.e0[0] // E) * E
            size = (t1 - t0 + 2) * E
            cpp = _dc.replace(cp, e0=cp.e0 - eA)
        v = vals_fn(eA, size, token)
        we = w_edge
        if we is not None and eA is not None:
            # pad by `size` so the slice always fits: lax.dynamic_slice
            # CLAMPS out-of-bounds starts, which would silently shift the
            # rebased window
            we = jax.lax.dynamic_slice_in_dim(jnp.pad(we, (0, size)), eA, size)
        ws = None if w_slots is None else w_slots[t0:t1]
        if nw:
            if nw != n:
                v = jnp.pad(v, ((0, 0), (0, nw - n)))
            out = plan_segment_sum_packed2(cpp, v, w_slots=ws, w_edge=we)
            return out[: cpp.num_segments, :n]
        f_tile = _pick_f_tile(n)
        f_pad = _round_up(max(n, 1), f_tile)
        if f_pad != n:
            v = jnp.pad(v, ((0, 0), (0, f_pad - n)))
        out = plan_segment_sum_sr2(
            cpp, v, vals_layout="edge", w_slots=ws, w_edge=we, f_tile=f_tile
        )
        return out[: cpp.num_segments, :n]

    return _plan_sum_chunked(plan, run_one)


def _bat_sum(
    bp: BatPlan,
    vals_fn,
    n: int,
    w_edge: Optional[jax.Array] = None,
):
    """Tiled segment sum over EDGE-ordered values via the block-aligned-tile
    kernels (v3): single raw value block per tile, raw dst/weight rows, no
    rolls. `vals_fn(vbase, size, token)` returns value rows for edges
    [vbase*e_tile, vbase*e_tile + size) (vbase traced block index, or None
    for the whole array)."""
    E = bp.e_tile
    nw = _packed_width(n)
    packed = bool(nw) and nw < 128 and bp.km_pack == (128 // nw) and bp.dst_km is not None
    if not packed and len(bp.chunks) > 2:
        # many chunks: lax.scan compiles the chunk body ONCE instead of
        # unrolling it per chunk — at products scale (~30 chunks) the
        # unrolled program took ~7 min to compile; the scan body is the
        # same gather + BAT kernel + accumulate
        return _bat_sum_scan(bp, vals_fn, n, w_edge)

    def run_one(cp, t0, t1, w0, token):
        if t0 == 0 and t1 == bp.num_tiles:
            cpp, v, we = cp, vals_fn(None, bp.num_edges, token), w_edge
        else:
            vbase = cp.vblock[0]
            nblk = t1 - t0 + 1
            size = nblk * E
            if not packed and size % 1024 == 0:
                size += 512  # fast-emitter gather size (see _bat_sum_scan)
            # rebase: pad (sentinel) tiles point past the real blocks at a
            # forced -1 block; dst ids shift into the chunk's window-local
            # range (-1 entries shift too but stay below any window base)
            vb_rel = jnp.where(
                cp.vblock >= bp.n_vblocks, nblk, cp.vblock - vbase
            )
            dst3 = jax.lax.dynamic_slice_in_dim(
                jnp.pad(
                    bp.dst3[: bp.n_vblocks],
                    ((0, nblk + 1), (0, 0), (0, 0)),
                    constant_values=-1,
                ),
                vbase, nblk + 1,
            )
            dst3 = dst3.at[nblk].set(-1) - w0 * bp.s_tile
            dkm = None
            if packed:
                dkm = jax.lax.dynamic_slice_in_dim(
                    jnp.pad(
                        bp.dst_km[: bp.n_vblocks],
                        ((0, nblk + 1),) + ((0, 0),) * (bp.dst_km.ndim - 1),
                        constant_values=-1,
                    ),
                    vbase, nblk + 1,
                )
                dkm = dkm.at[nblk].set(-1) - w0 * bp.s_tile
            cpp = _dc.replace(
                cp, vblock=vb_rel, dst3=dst3, dst_km=dkm, n_vblocks=nblk,
            )
            v = vals_fn(vbase, size, token)
            we = w_edge
            if we is not None:
                we = jax.lax.dynamic_slice_in_dim(
                    jnp.pad(we, (0, size)), vbase * E, size
                )
        if packed:
            if nw != n:
                v = jnp.pad(v, ((0, 0), (0, nw - n)))
            out = bat_segment_sum_packed(cpp, v, we)
            return out[: cpp.num_segments, :n]
        f_tile = _pick_f_tile(n)
        f_pad = _round_up(max(n, 1), f_tile)
        if f_pad != n:
            v = jnp.pad(v, ((0, 0), (0, f_pad - n)))
        out = bat_segment_sum(cpp, v, we, f_tile=f_tile)
        return out[: cpp.num_segments, :n]

    return _plan_sum_chunked(bp, run_one)


def _bat_sum_scan(
    bp: BatPlan,
    vals_fn,
    n: int,
    w_edge: Optional[jax.Array],
    *,
    chunk_meta=None,
):
    """Wide BAT segment sum with uniform chunks executed under `lax.scan`:
    one compiled chunk body (gather → BAT kernel → accumulate-at-offset)
    instead of an unrolled program per chunk. Chunk outputs overlap only on
    hub-split windows and zero pad windows, so accumulating each chunk's
    [W_c*s_tile, F] block into the carry at w0*s_tile is exact — the same
    overlap-add stitch `_plan_sum_chunked` does by concatenation.

    `chunk_meta` = (C, T_c, W_c, w0s, w1s) overrides the static
    `bp.chunks`-derived schedule with traced per-chunk window arrays — the
    multi-chip path needs this because shard_map runs ONE program on every
    part while each part's chunk windows are data (see
    `parallel.bat_partition`)."""
    import numpy as np

    E, s = bp.e_tile, bp.s_tile
    if chunk_meta is None:
        C = len(bp.chunks)
        T_c = bp.chunks[0][1] - bp.chunks[0][0]
        W_c = bp.chunk_blocks or max(w1 - w0 for _, _, w0, w1 in bp.chunks)
        assert all(
            t1 - t0 == T_c for t0, t1, _, _ in bp.chunks
        ), "chunks not uniform"
        w0s = jnp.asarray(np.asarray([c[2] for c in bp.chunks], np.int32))
        w1s = jnp.asarray(np.asarray([c[3] for c in bp.chunks], np.int32))
    else:
        C, T_c, W_c, w0s, w1s = chunk_meta
    # gather only the chunk's real value-block span when the plan measured
    # it (chunk_vblocks) — tiles outnumber value blocks by the window-
    # crossing factor and the per-chunk gather previously covered tiles+1
    # blocks (~1.5x over-gather on sparse residues, round-5 dissection)
    nblk = min(bp.chunk_vblocks or (T_c + 1), T_c + 1)
    # fast-emitter gather size: XLA's materialized row gather runs ~11
    # ns/row when the index count is divisible by 1024 and ~5 ns/row
    # otherwise (measured, scratch_r5/rest{6,7,8}.log) — round any
    # 1024-divisible request up to an odd multiple of 512; the extra rows
    # land beyond the kernel's addressed blocks and are ignored
    g_size = nblk * E
    if g_size % 1024 == 0:
        g_size += 512
    f_tile = _pick_f_tile(n)
    f_pad = _round_up(max(n, 1), f_tile)

    ob2 = bp.out_block.reshape(C, T_c)
    vb2 = bp.vblock.reshape(C, T_c)
    # first tile of each chunk is real (all-pad chunks from cross-part
    # equalization carry the sentinel there — the `where` handles it and
    # the dst3 slice at the sentinel lands in the all--1 pad region)
    vbase = jnp.where(vb2[:, 0] >= bp.n_vblocks, bp.n_vblocks, vb2[:, 0])
    vb_rel = jnp.where(vb2 >= bp.n_vblocks, nblk, vb2 - vbase[:, None])
    ob_rel = ob2 - w0s[:, None]
    # dst3 with nblk+1 sentinel blocks appended: any chunk's slice
    # [vbase, vbase+nblk+1) then ends in -1 blocks
    dst3_pad = jnp.pad(
        bp.dst3[: bp.n_vblocks],
        ((0, nblk + 1), (0, 0), (0, 0)),
        constant_values=-1,
    )
    w_pad = None
    if w_edge is not None:
        w_pad = jnp.pad(w_edge, (0, nblk * E))

    def body(carry, xs):
        vb0, w0, w1, vb_i, ob_i = xs
        dst3 = (
            jax.lax.dynamic_slice_in_dim(dst3_pad, vb0, nblk + 1)
            .at[nblk]
            .set(-1)
            - w0 * s
        )
        cpp = BatPlan(
            out_block=ob_i,
            vblock=vb_i,
            dst3=dst3,
            dst_km=None,
            mask_km=None,
            e_tile=E,
            s_tile=s,
            num_segments=W_c * s,
            n_blocks=W_c,
            num_edges=nblk * E,
            n_vblocks=nblk,
        )
        v = vals_fn(vb0, g_size, None)
        if f_pad != v.shape[1]:
            v = jnp.pad(v, ((0, 0), (0, f_pad - v.shape[1])))
        we = None
        if w_pad is not None:
            we = jax.lax.dynamic_slice_in_dim(w_pad, vb0 * E, nblk * E)
        out_c = bat_segment_sum(cpp, v, we, f_tile=f_tile).astype(jnp.float32)
        # rows past the chunk's REAL windows may be uninitialized kernel
        # output (full chunks carry no coverage tile for pad windows) —
        # the concat path trims them; here they must not reach the carry
        rows = jax.lax.broadcasted_iota(jnp.int32, (W_c * s, 1), 0)
        out_c = jnp.where(rows < (w1 - w0) * s, out_c, 0.0)
        off = w0 * s
        cur = jax.lax.dynamic_slice(carry, (off, 0), (W_c * s, f_pad))
        return jax.lax.dynamic_update_slice(carry, cur + out_c, (off, 0)), None

    # margin rows absorb trailing pad windows (w0 + W_c can pass n_blocks)
    carry0 = jnp.zeros((bp.n_blocks * s + W_c * s, f_pad), jnp.float32)
    out, _ = jax.lax.scan(body, carry0, (vbase, w0s, w1s, vb_rel, ob_rel))
    dt = jax.eval_shape(
        lambda: vals_fn(jnp.zeros((), jnp.int32), nblk * E, None)
    ).dtype
    return out[: bp.num_segments, :n].astype(dt)


def _bucketed_sum(bp, x: jax.Array) -> jax.Array:
    """Segment sum over a BucketedBatPlan (weights baked into the plan):
    each scan step slices the chunk's SOURCE BUCKET out of `x` and gathers
    from that small table — on v5e the XLA row gather from a <=170k-row
    slice runs ~2-4x faster than from a products-scale table, and chunked
    execution over the full table re-pays a table-size-dependent cost per
    chunk (measured: ~20 ms per products chunk)."""
    from geot_tpu.graph.plan import BucketedBatPlan  # noqa: F401

    E, s = bp.e_tile, bp.s_tile
    n = x.shape[1]
    f_tile = _pick_f_tile(n)
    f_pad = _round_up(max(n, 1), f_tile)
    if f_pad != n:
        x = jnp.pad(x, ((0, 0), (0, f_pad - n)))
    bn = bp.bucket_rows
    n_buckets = -(-x.shape[0] // bn)
    if x.shape[0] != n_buckets * bn:
        x = jnp.pad(x, ((0, n_buckets * bn - x.shape[0]), (0, 0)))

    C = len(bp.chunks)
    T_c = bp.chunks[0][1] - bp.chunks[0][0]
    W_c = bp.chunk_blocks
    nblk = T_c + 1
    ob2 = bp.out_block.reshape(C, T_c)
    vb2 = bp.vblock.reshape(C, T_c)
    vbase = jnp.min(
        jnp.where(vb2 >= bp.n_vblocks, jnp.iinfo(jnp.int32).max, vb2), axis=1
    )
    vbase = jnp.where(vbase == jnp.iinfo(jnp.int32).max, 0, vbase)
    import numpy as _np

    w0s = jnp.asarray(_np.asarray([c[2] for c in bp.chunks], _np.int32))
    w1s = jnp.asarray(_np.asarray([c[3] for c in bp.chunks], _np.int32))
    roffs = jnp.asarray(_np.asarray([c[4] for c in bp.chunks], _np.int32))
    vb_rel = jnp.where(vb2 >= bp.n_vblocks, nblk, vb2 - vbase[:, None])
    ob_rel = ob2 - w0s[:, None]
    dst3_pad = jnp.pad(
        bp.dst3[: bp.n_vblocks],
        ((0, nblk + 1), (0, 0), (0, 0)),
        constant_values=-1,
    )
    srcl_pad = jnp.pad(bp.src_local, (0, (nblk + 1) * E))
    wz_pad = (
        None if bp.w_pad is None else jnp.pad(bp.w_pad, (0, (nblk + 1) * E))
    )

    def body(carry, xs):
        vb0, w0, w1, roff, vb_i, ob_i = xs
        dst3 = (
            jax.lax.dynamic_slice_in_dim(dst3_pad, vb0, nblk + 1)
            .at[nblk]
            .set(-1)
            - w0 * s
        )
        cpp = BatPlan(
            out_block=ob_i,
            vblock=vb_i,
            dst3=dst3,
            dst_km=None,
            mask_km=None,
            e_tile=E,
            s_tile=s,
            num_segments=W_c * s,
            n_blocks=W_c,
            num_edges=nblk * E,
            n_vblocks=nblk,
        )
        idx = jax.lax.dynamic_slice_in_dim(srcl_pad, vb0 * E, nblk * E)
        xslice = jax.lax.dynamic_slice(x, (roff, 0), (bn, f_pad))
        v = xslice[idx]
        we = None
        if wz_pad is not None:
            we = jax.lax.dynamic_slice_in_dim(wz_pad, vb0 * E, nblk * E)
        out_c = bat_segment_sum(cpp, v, we, f_tile=f_tile).astype(jnp.float32)
        rows = jax.lax.broadcasted_iota(jnp.int32, (W_c * s, 1), 0)
        out_c = jnp.where(rows < (w1 - w0) * s, out_c, 0.0)
        off = w0 * s
        cur = jax.lax.dynamic_slice(carry, (off, 0), (W_c * s, f_pad))
        return jax.lax.dynamic_update_slice(carry, cur + out_c, (off, 0)), None

    carry0 = jnp.zeros((bp.n_blocks * s + W_c * s, f_pad), jnp.float32)
    out, _ = jax.lax.scan(
        body, carry0, (vbase, w0s, w1s, roffs, vb_rel, ob_rel)
    )
    return out[: bp.num_segments, :n].astype(x.dtype)


@functools.lru_cache(maxsize=None)
def _make_spmm_bucketed():
    """Static-weight fused SpMM over bucketed BAT plans (weights baked);
    backward = bucketed sum over the transpose plan (no dw — mirrors
    `_make_gws_bat(static_w=True)`)."""

    @jax.custom_vjp
    def f(x, bb, bb_t):
        return _bucketed_sum(bb, x)

    def fwd(x, bb, bb_t):
        return f(x, bb, bb_t), (bb_t,)

    def bwd(res, g):
        (bb_t,) = res
        return (_bucketed_sum(bb_t, g), None, None)

    f.defvjp(fwd, bwd)
    return f


def _w_slots(
    plan: SegmentPlan,
    w_edge: Optional[jax.Array],
    idx: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-call edge weights -> slot order. `idx` overrides the slot->edge
    map (the precomposed transpose indices in backward, which saves the
    second permutation). A widened row-gather was tried and measured slower
    in context (broadcast materialization outweighs gather efficiency)."""
    if w_edge is None:
        return plan.mask
    gather_idx = (plan.edge_pos if idx is None else idx).reshape(-1)
    return plan.mask * w_edge[gather_idx].reshape(plan.mask.shape)


def _slot_spmm(plan: SegmentPlan, x: jax.Array, w_slots: jax.Array, use_pallas):
    """sum over slots: out[dst_slot] += w_slot * x[src_slot] — the common
    engine once weights are already in slot order (cached on the Graph,
    avoiding the per-call nnz scalar gather)."""
    if use_pallas:
        return _plan_sum_gather(
            plan,
            _fast_gather_fn(x, plan.src_slots, x.shape[1]),
            w_slots,
            x.shape[1],
        )
    vals = x[plan.src_slots.reshape(-1)] * w_slots.reshape(-1)[:, None].astype(x.dtype)
    return (
        jnp.zeros((plan.num_segments, x.shape[1]), jnp.float32)
        .at[plan.dst_slots.reshape(-1)]
        .add(vals, mode="drop")
        .astype(x.dtype)
    )


@functools.lru_cache(maxsize=None)
def _make_gws_static(use_pallas: bool):
    """Weighted SpMM with graph-constant weights (GCN-norm style): weights
    live in slot order on the Graph; differentiable w.r.t. x only.
    Backward = transpose plan with the transpose slot weights (reference
    semantics: `geot/gather_weight_scatter.py:36-46` minus the weight grad,
    and minus its per-call sort)."""

    @jax.custom_vjp
    def gws(x, plan, plan_t, w_slots, w_slots_t):
        return _slot_spmm(plan, x, w_slots, use_pallas)

    def fwd(x, plan, plan_t, w_slots, w_slots_t):
        return gws(x, plan, plan_t, w_slots, w_slots_t), (plan_t, w_slots_t)

    def bwd(res, g):
        plan_t, w_slots_t = res
        dx = _slot_spmm(plan_t, g, w_slots_t, use_pallas)
        return (dx, None, None, None, None)

    gws.defvjp(fwd, bwd)
    return gws


def _spmm_fwd(plan, x, w_edge, src, dst, use_pallas, w_idx=None):
    """sum_e w_e * x[src_e] grouped by dst_e."""
    if not use_pallas:
        if w_edge is None:
            return ref.gather_scatter_ref(src, dst, x, plan.num_segments)
        return ref.gather_weight_scatter_ref(src, dst, w_edge, x, plan.num_segments)
    n = x.shape[1]
    if w_edge is not None and w_idx is None and plan.e0 is not None:
        # dynamic per-call weights: the weight permutation runs inside the
        # kernel via the AEB loader (edge order + roll) — the nnz scalar
        # gather `w[edge_pos]` costs ~10ms/M edges on TPU and previously
        # made this path lose to plain XLA (VERDICT r1 "What's missing" #2)
        if _aeb_packed_ok(plan, n):
            # narrow features: gather x rows in EDGE order, packed kernel

            def vals_fn(eA, size, token):
                if eA is None:
                    # index pad is cheap and makes the gathered rows an
                    # e_tile multiple (no ragged-tail handling downstream)
                    nnz = src.shape[0]
                    idx = jnp.pad(src, (0, _round_up(nnz, plan.e_tile) - nnz))
                else:
                    # pad by `size`: dynamic_slice clamps OOB starts
                    idx = jax.lax.dynamic_slice_in_dim(
                        jnp.pad(src, (0, size)), eA, size
                    )
                return _gated(x, token)[idx]

            return _aeb_sum(plan, vals_fn, n, w_edge=w_edge)
        # wide: slot-ordered x gather (as the static path) + rolled weights
        gfn = _fast_gather_fn(x, plan.src_slots, n)
        f_tile = _pick_f_tile(n)
        f_pad = _round_up(max(n, 1), f_tile)

        def run_one(cp, t0, t1, w0, token):
            v = gfn(t0 * plan.e_tile, t1 * plan.e_tile, token)
            if f_pad != n:
                v = jnp.pad(v, ((0, 0), (0, f_pad - n)))
            out = plan_segment_sum_sr2(
                cp, v, vals_layout="slot", w_edge=w_edge, f_tile=f_tile
            )
            return out[: cp.num_segments, :n]

        return _plan_sum_chunked(plan, run_one)
    return _plan_sum_gather(
        plan,
        _fast_gather_fn(x, plan.src_slots, n),
        _w_slots(plan, w_edge, w_idx),
        n,
    )


def _spmm_fwd_bat(bp: BatPlan, x, src, w_edge, token_gate=True):
    """sum_e w_e * x[src_e] by dst window, via the v3 BAT kernels: the
    gather emits rows in raw EDGE order (no slot layout) and weights stream
    as raw blocks (per-call weights cost nothing extra)."""
    E = bp.e_tile
    n = x.shape[1]
    # wide path: pad x's columns to the kernel's feature tile BEFORE the
    # gather — otherwise every chunk pays a full pad copy of its gathered
    # [chunk_edges, N] block (a multi-GB transient at products scale)
    if _packed_width(n) == 0:
        f_pad = _round_up(max(n, 1), _pick_f_tile(n))
        if f_pad != n:
            x = jnp.pad(x, ((0, 0), (0, f_pad - n)))

    def vals_fn(vbase, size, token):
        if vbase is None:
            nnz = src.shape[0]
            idx = jnp.pad(src, (0, _round_up(max(nnz, E), E) - nnz))
        else:
            idx = jax.lax.dynamic_slice_in_dim(
                jnp.pad(src, (0, size)), vbase * E, size
            )
        return _gated(x, token)[idx]

    out = _bat_sum(bp, vals_fn, x.shape[1], w_edge=w_edge)
    return out[:, :n] if x.shape[1] != n else out


def _stream_accum(sp, x, carry, f_tile):
    """Add one stream family's contribution into the carry buffer
    [n_blocks*s, f_pad] via the aliased accumulate kernel — only the
    window blocks this family's tiles visit are touched (round-4: sparse-
    window families previously paid a full-size combine buffer per chunk,
    ~2x at products scale)."""
    from geot_tpu.ops.pallas_segment import stream_segment_acc

    s = sp.s_tile
    if not sp.chunks:
        return stream_segment_acc(
            sp.out_block, sp.sblock, sp.dst3, sp.srcl3, x, carry, sp.w3,
            s_tile=s, x_rows=sp.x_rows, f_tile=f_tile,
        )

    # uniform chunks under lax.scan: ONE compiled chunk body, each chunk
    # accumulating straight into the carry (hub windows split mid-chunk
    # combine correctly: later chunks read the earlier partial via the
    # aliased carry block)
    C = len(sp.chunks)
    T_c = sp.chunks[0][1] - sp.chunks[0][0]
    assert all(t1 - t0 == T_c for t0, t1, _, _ in sp.chunks)
    ob2 = sp.out_block.reshape(C, T_c)  # GLOBAL windows
    sb2 = sp.sblock.reshape(C, T_c)
    dst2 = sp.dst3.reshape(C, T_c, 1, sp.e_tile)
    srcl2 = sp.srcl3.reshape(C, T_c, 1, sp.e_tile)
    w2 = None if sp.w3 is None else sp.w3.reshape(C, T_c, 1, sp.e_tile)

    def body(carry, xs):
        if w2 is None:
            ob_i, sb_i, dst_i, srcl_i = xs
            w_i = None
        else:
            ob_i, sb_i, dst_i, srcl_i, w_i = xs
        carry = stream_segment_acc(
            ob_i, sb_i, dst_i, srcl_i, x, carry, w_i,
            s_tile=s, x_rows=sp.x_rows, f_tile=f_tile,
        )
        return carry, None

    xs = (ob2, sb2, dst2, srcl2)
    if w2 is not None:
        xs = xs + (w2,)
    out, _ = jax.lax.scan(body, carry, xs)
    return out


def _stream_sum(plans, x: jax.Array) -> jax.Array:
    """Gather-free streaming segment sum over StreamPlan families (weights,
    if any, are baked into each family's w3 at build). Families (one per
    tile size — round-4 per-cell e_tile assignment) accumulate into one
    carry. Returns [num_segments, n]."""
    fams = tuple(plans) if isinstance(plans, (list, tuple)) else (plans,)
    assert fams, "_stream_sum: empty stream-family tuple (corrupt HybridPlan?)"
    sp0 = fams[0]
    n = x.shape[1]
    f_tile = _pick_f_tile(n)
    f_pad = _round_up(max(n, 1), f_tile)
    rows_pad = sp0.n_xblocks * sp0.x_rows
    if f_pad != n or rows_pad != x.shape[0]:
        x = jnp.pad(x, ((0, rows_pad - x.shape[0]), (0, f_pad - n)))
    carry = jnp.zeros((sp0.n_blocks * sp0.s_tile, f_pad), jnp.float32)
    for sp in fams:
        carry = _stream_accum(sp, x, carry, f_tile)
    return carry[: sp0.num_segments, :n].astype(x.dtype)


def _spmm_fwd_hybrid(hyb, x: jax.Array) -> jax.Array:
    """Streamed dense cells + BAT+gather remainder; partial sums add.
    Weights (if any) were baked into both parts at graph build."""
    out = _stream_sum(hyb.stream, x)
    if hyb.rest is not None:
        out = out + _spmm_fwd_bat(hyb.rest, x, hyb.rest_src, hyb.rest_w)
    return out


@functools.lru_cache(maxsize=None)
def _make_spmm_hybrid():
    """Fused SpMM over hybrid stream+gather plans (static/no weights, baked
    at build); backward = transpose hybrid, like the other static paths."""

    @jax.custom_vjp
    def f(x, hyb, hyb_t):
        return _spmm_fwd_hybrid(hyb, x)

    def fwd(x, hyb, hyb_t):
        return f(x, hyb, hyb_t), (hyb_t,)

    def bwd(res, g):
        (hyb_t,) = res
        return (_spmm_fwd_hybrid(hyb_t, g), None, None)

    f.defvjp(fwd, bwd)
    return f


@functools.lru_cache(maxsize=None)
def _make_gs_bat(use_pallas: bool):
    """Unweighted fused SpMM over BAT plans; backward = transpose BAT."""

    @jax.custom_vjp
    def gs(x, src, dst, dst_t, bat, bat_t):
        if not use_pallas:
            return ref.gather_scatter_ref(src, dst, x, bat.num_segments)
        return _spmm_fwd_bat(bat, x, src, None)

    def fwd(x, src, dst, dst_t, bat, bat_t):
        return gs(x, src, dst, dst_t, bat, bat_t), (src, dst, dst_t, bat_t)

    def bwd(res, g):
        src, dst, dst_t, bat_t = res
        if use_pallas:
            dx = _spmm_fwd_bat(bat_t, g, dst_t, None)
        else:
            dx = ref.gather_scatter_ref(dst, src, g, bat_t.num_segments)
        return (dx, None, None, None, None, None)

    gs.defvjp(fwd, bwd)
    return gs


@functools.lru_cache(maxsize=None)
def _make_gws_bat(use_pallas: bool, static_w: bool):
    """Weighted fused SpMM over BAT plans. static_w=True: weights are graph
    constants with a precomputed transpose-order copy (no dw); False:
    per-call weights, dw via SDDMM, transpose weights permuted at runtime
    through `perm_t` (the reference re-sorts edges per backward instead,
    `geot/gather_weight_scatter.py:41`)."""

    @jax.custom_vjp
    def gws(x, w, src, dst, dst_t, w_t_or_perm, bat, bat_t):
        if not use_pallas:
            return ref.gather_weight_scatter_ref(src, dst, w, x, bat.num_segments)
        return _spmm_fwd_bat(bat, x, src, w)

    def fwd(x, w, src, dst, dst_t, w_t_or_perm, bat, bat_t):
        return gws(x, w, src, dst, dst_t, w_t_or_perm, bat, bat_t), (
            x, w, src, dst, dst_t, w_t_or_perm, bat, bat_t,
        )

    def bwd(res, g):
        x, w, src, dst, dst_t, w_t_or_perm, bat, bat_t = res
        w_t = w_t_or_perm if static_w else w[w_t_or_perm]
        if use_pallas:
            dx = _spmm_fwd_bat(bat_t, g, dst_t, w_t)
        else:
            dx = ref.gather_weight_scatter_ref(dst, src, w, g, bat_t.num_segments)
        if static_w:
            return (dx, None, None, None, None, None, None, None)
        # weight gradient dw[e] = <g[dst[e]], x[src[e]]>: the BAT SDDMM
        # kernel streams the dst-side (cotangent) rows as window blocks —
        # no gather on that side (reference: geot/gather_weight_scatter.py:47
        # always re-gathers both sides)
        if use_pallas and x.shape[1] >= 8 and (
            src.shape[0] * max(x.shape[1], 128) * 4
            <= int(os.environ.get("GEOT_SDDMM_MAX_BYTES", 4 << 30))
        ):
            dw = _sddmm_bat_fwd(bat, g, x, src)
        else:
            dw = ref.sddmm_coo_ref(src, dst, g, x)
        return (dx, dw.astype(w.dtype), None, None, None, None, None, None)

    gws.defvjp(fwd, bwd)
    return gws


def _mh_fwd(plan, x, w_heads, src, dst, use_pallas):
    """x: [nodes, H, D]; w_heads: [nnz, H] → [num_segments, H, D].

    Chunk-streamed like the SpMM paths: the [T*E, H*D] slot gather is
    materialized one chunk at a time (plan.chunks bounds it), so
    reddit2-scale multi-head graphs fit on one chip."""
    n_nodes, H, D = x.shape
    if not use_pallas:
        return ref.mh_spmm_ref(src, dst, w_heads, x, plan.num_segments)
    # Flat (H*D)-lane layout: the kernel's head-selector
    # (`head_of_lane >= n_heads` → zero weight) makes trailing pad lanes
    # inert, so no per-head padding is needed — H=4, D=16 gathers 64
    # lanes, not 4×128 (which measured 48 ms vs 18 ms for the same bytes
    # at arxiv, campaign r5 mh4 grid). Sub-128 widths run unpadded (the
    # kernel takes f_tile = H*D, same as the fused GAT slot path); only
    # >128 non-multiples pad up to the lane tile.
    if H * D < 128 and (H * D) % 8 == 0:
        f_pad = f_tile = H * D
    else:
        f_pad = _round_up(H * D, 128)
        f_tile = _pick_f_tile(f_pad)
    x2 = x.reshape(n_nodes, H * D)
    if f_pad != H * D:
        x2 = jnp.pad(x2, ((0, 0), (0, f_pad - H * D)))

    def run_one(cp, t0, t1, w0, token):
        vals = _gated(x2, token)[cp.src_slots.reshape(-1)]
        wh = w_heads[cp.edge_pos.reshape(-1)] * cp.mask.reshape(-1)[
            :, None
        ].astype(w_heads.dtype)
        out = plan_segment_sum_mh(cp, vals, wh, D, f_tile=f_tile)
        return out[: cp.num_segments]

    out = _plan_sum_chunked(plan, run_one)
    return out[:, : H * D].reshape(plan.num_segments, H, D)


def segment_counts(plan, backend: str = "auto") -> jax.Array:
    """Edges per segment (degree), computed with the PR kernel — the basis
    for mean reduction."""
    if isinstance(plan, BatPlan):
        d = plan.dst3.reshape(-1)
        return (
            jnp.zeros(plan.num_segments, jnp.float32)
            .at[d]
            .add((d >= 0).astype(jnp.float32), mode="drop")
        )
    if not _use_pallas(backend) or plan.s_tile % 128 != 0:
        return (
            jnp.zeros(plan.num_segments, jnp.float32)
            .at[plan.dst_slots.reshape(-1)]
            .add(plan.mask.reshape(-1), mode="drop")
        )
    ones = jnp.ones((8, plan.num_tiles * plan.e_tile), jnp.float32)
    out_t = plan_segment_sum_pr(plan, ones, plan.mask)
    return out_t[0, : plan.num_segments]


# ---------------------------------------------------------------------------
# differentiable primitives (sum-reduce; mean/max/min handled at API level)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _make_gs(use_pallas: bool):
    @jax.custom_vjp
    def gs(x, src, dst, plan, plan_t, perm_t):
        return _spmm_fwd(plan, x, None, src, dst, use_pallas)

    def fwd(x, src, dst, plan, plan_t, perm_t):
        return gs(x, src, dst, plan, plan_t, perm_t), (src, dst, plan_t)

    def bwd(res, g):
        src, dst, plan_t = res
        # dx[s] = sum_{e: src_e=s} g[dst_e] — transpose gather_scatter
        # (reference backward: geot/gather_scatter.py:26-37)
        dx = _spmm_fwd(plan_t, g, None, dst, src, use_pallas)
        return (dx, None, None, None, None, None)

    gs.defvjp(fwd, bwd)
    return gs


@functools.lru_cache(maxsize=None)
def _make_gws(use_pallas: bool):
    @jax.custom_vjp
    def gws(x, w, src, dst, plan, plan_t, perm_t):
        return _spmm_fwd(plan, x, w, src, dst, use_pallas)

    def fwd(x, w, src, dst, plan, plan_t, perm_t):
        return gws(x, w, src, dst, plan, plan_t, perm_t), (
            x,
            w,
            src,
            dst,
            plan_t,
            perm_t,
        )

    def bwd(res, g):
        x, w, src, dst, plan_t, edge_pos_t = res
        # (reference backward: geot/gather_weight_scatter.py:36-49, but with
        # the precomputed CSC permutation instead of a per-call sort; the
        # slot->dst-sorted-edge map is precomposed so weights permute once)
        if use_pallas:
            dx = _spmm_fwd(plan_t, g, w, dst, src, True, w_idx=edge_pos_t)
        else:
            dx = ref.gather_weight_scatter_ref(
                dst, src, w, g, plan_t.num_segments
            )
        dw = ref.sddmm_coo_ref(src, dst, g, x).astype(w.dtype)
        return (dx, dw, None, None, None, None, None)

    gws.defvjp(fwd, bwd)
    return gws


@functools.lru_cache(maxsize=None)
def _make_mh(use_pallas: bool):
    @jax.custom_vjp
    def mh(x, w, src, dst, plan, plan_t, perm_t):
        return _mh_fwd(plan, x, w, src, dst, use_pallas)

    def fwd(x, w, src, dst, plan, plan_t, perm_t):
        return mh(x, w, src, dst, plan, plan_t, perm_t), (
            x,
            w,
            src,
            dst,
            plan_t,
            perm_t,
        )

    def bwd(res, g):
        x, w, src, dst, plan_t, perm_t = res
        if use_pallas:
            dx = _mh_fwd(plan_t, g, w[perm_t], dst, src, True)
        else:
            dx = ref.mh_spmm_ref(dst, src, w, g, plan_t.num_segments)
        # per-head SDDMM: dw[e, h] = <g[dst_e, h], x[src_e, h]>
        dw = jnp.sum(g[dst] * x[src], axis=-1).astype(w.dtype)
        return (dx, dw, None, None, None, None, None)

    mh.defvjp(fwd, bwd)
    return mh


@functools.lru_cache(maxsize=None)
def _make_iscat(use_pallas: bool):
    @jax.custom_vjp
    def iscat(vals, dst, plan):
        if not use_pallas:
            return ref.segment_reduce_ref(vals, dst, plan.num_segments, "sum")
        if isinstance(plan, BatPlan):
            # v3: raw block-aligned streaming of `vals` — no gather, no roll
            E = plan.e_tile
            if plan.chunks:
                def vals_fn(vbase, size, token):
                    if vbase is None:
                        return vals
                    vp = jnp.pad(vals, ((0, size), (0, 0)))
                    return jax.lax.dynamic_slice_in_dim(
                        _gated(vp, token), vbase * E, size
                    )
            else:
                vals_fn = lambda vbase, size, token: vals
            return _bat_sum(plan, vals_fn, vals.shape[-1])
        if plan.e0 is not None:
            # AEB path: the kernel streams `vals` directly in edge order
            # (two aligned blocks + in-kernel roll) — no slot gather at all.
            # This removes round-1's known perf gap (arxiv N=32: a 61 ms
            # XLA slot gather); narrow features additionally pack
            # 128//n edges per lane row. Matches the reference's PR
            # schedule for narrow features
            # (`csrc/cuda/index_scatter_kernel.cuh:48-126`).
            n = vals.shape[-1]
            if plan.chunks:

                def vals_fn(eA, size, token):
                    if eA is None:
                        return vals
                    # pad by `size`: dynamic_slice clamps OOB starts
                    vp = jnp.pad(vals, ((0, size), (0, 0)))
                    return jax.lax.dynamic_slice_in_dim(
                        _gated(vp, token), eA, size
                    )

            else:
                vals_fn = lambda eA, size, token: vals
            return _aeb_sum(plan, vals_fn, n)
        ep = plan.edge_pos.reshape(-1)
        # legacy slot-gather fallback (plans without e0)
        return _plan_sum_gather(
            plan,
            lambda lo, hi, tok: _gated(vals, tok)[ep[lo:hi]],
            plan.mask,
            vals.shape[-1],
        )

    def fwd(vals, dst, plan):
        return iscat(vals, dst, plan), (dst,)

    def bwd(res, g):
        (dst,) = res
        return (g[dst], None, None)

    iscat.defvjp(fwd, bwd)
    return iscat


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def _apply_reduce_post(out_sum, plan, reduce, backend):
    if reduce == "sum":
        return out_sum
    if reduce == "mean":
        deg = segment_counts(plan, backend)
        return out_sum / jnp.maximum(deg, 1.0)[
            (...,) + (None,) * (out_sum.ndim - 1)
        ].astype(out_sum.dtype)
    raise ValueError(f"unsupported fused reduce {reduce!r}")


def index_scatter(
    src: jax.Array,
    index: jax.Array,
    num_segments: int,
    *,
    reduce: str = "sum",
    sorted: bool = True,
    plan: Optional[SegmentPlan] = None,
    backend: str = "auto",
    axis: int = 0,
) -> jax.Array:
    """Sorted segment reduction: out[index[i]] ⊕= src[i] along `axis`.

    Reference: `geot/index_scatter.py:5-8` (its `dim` arg is `axis` here;
    output size comes from static `num_segments`).
    """
    if axis != 0:
        src = jnp.moveaxis(src, axis, 0)
    up = _use_pallas(backend) and plan is not None and reduce in ("sum", "mean")
    if up and backend == "auto":
        # latency-floor crossover: tiny (nnz, N) grids lose to XLA's fused
        # scatter — consult the measured table / heuristic per call (the
        # per-shape implementation pick of the reference's rule trees)
        from geot_tpu.tuning.heuristics import select_config

        n_flat = 1
        for d in src.shape[1:]:
            n_flat *= d
        if select_config(
            n_flat, src.shape[0], num_segments, op="index_scatter"
        ).mode == "xla":
            up = False
    if up:
        shape = src.shape
        vals = src.reshape(shape[0], -1)
        out = _make_iscat(True)(vals, index, plan)
        out = _apply_reduce_post(out, plan, reduce, backend)
        out = out.reshape((out.shape[0],) + shape[1:])
    else:
        out = ref.segment_reduce_ref(
            src, index, num_segments, reduce, indices_are_sorted=sorted
        )
    if axis != 0:
        out = jnp.moveaxis(out, 0, axis)
    return out


def gather_scatter(
    src_index: jax.Array,
    dst_index: jax.Array,
    src: jax.Array,
    num_segments: int,
    *,
    reduce: str = "sum",
    graph: Optional[Graph] = None,
    backend: str = "auto",
) -> jax.Array:
    """Unweighted fused SpMM over a dst-sorted COO edge list:
    out[dst[e]] ⊕= src[src[e]]. Reference: `geot/gather_scatter.py:7-39`.

    Pass `graph` (a prebuilt `Graph` whose src/dst match the indices) to hit
    the Pallas plan path with transpose-plan backward.
    """
    if (
        graph is not None
        and _use_pallas(backend)
        and reduce in ("sum", "mean")
        and not (backend == "auto" and graph.prefer == "xla")
    ):
        if getattr(graph, "hyb", None) is not None and graph.edge_weight is None:
            out = _make_spmm_hybrid()(src, graph.hyb, graph.hyb_t)
        elif graph.bat is not None:
            out = _make_gs_bat(True)(
                src, graph.src, graph.dst, graph.dst_t, graph.bat, graph.bat_t
            )
        else:
            out = _make_gs(True)(
                src, graph.src, graph.dst, graph.plan, graph.plan_t, graph.perm_t
            )
        return _apply_reduce_post(
            out, graph.plan if graph.plan is not None else graph.bat,
            reduce, backend,
        )
    return ref.gather_scatter_ref(src_index, dst_index, src, num_segments, reduce)


def gather_weight_scatter(
    src_index: jax.Array,
    dst_index: jax.Array,
    weight: jax.Array,
    src: jax.Array,
    num_segments: int,
    *,
    reduce: str = "sum",
    graph: Optional[Graph] = None,
    backend: str = "auto",
) -> jax.Array:
    """Edge-weighted fused SpMM: out[dst[e]] ⊕= weight[e] * src[src[e]].
    Reference: `geot/gather_weight_scatter.py:4-51`."""
    if (
        graph is not None
        and _use_pallas(backend)
        and reduce in ("sum", "mean")
        # latency-floor crossover: below the measured floor the XLA
        # reference path wins outright (table decision at graph build)
        and not (backend == "auto" and graph.prefer_dyn == "xla")
    ):
        if graph.bat is not None and (
            graph.prefer_dyn.startswith("bat") or graph.plan is None
        ):
            out = _make_gws_bat(True, False)(
                src, weight, graph.src, graph.dst, graph.dst_t,
                graph.perm_t, graph.bat, graph.bat_t,
            )
        else:
            out = _make_gws(True)(
                src, weight, graph.src, graph.dst, graph.plan, graph.plan_t,
                graph.edge_pos_t,
            )
        return _apply_reduce_post(
            out, graph.plan if graph.plan is not None else graph.bat,
            reduce, backend,
        )
    return ref.gather_weight_scatter_ref(
        src_index, dst_index, weight, src, num_segments, reduce
    )


def dispatch_path(
    graph: Graph,
    *,
    dynamic_w: bool = False,
    reduce: str = "sum",
    backend: str = "auto",
) -> str:
    """Which implementation `segment_spmm` will run for this (graph, call)
    — the single source of truth consulted by both execution and the
    dispatch-audit tests (a mis-route silently falls back to a slower-but-
    correct path, so tests assert the SELECTION, not just the value).

    Returns one of:
      'hybrid'      streamed dense cells + BAT remainder (static weights)
      'bucketed'    sliced-table bucketed BAT (static weights baked)
      'bat_static'  BAT kernels, static weights in edge order
      'slot_static' slot-layout kernels, static slot weights
      'bat'         BAT kernels, unweighted
      'slot'        slot-layout kernels, unweighted
      'bat_dyn'     BAT kernels, per-call weights
      'slot_dyn'    slot-layout kernels, per-call weights
      'xla'         plain XLA reference path
    """
    use_p = _use_pallas(backend) and reduce in ("sum", "mean")
    in_sum = reduce in ("sum", "mean")
    if (
        in_sum
        and not dynamic_w
        and use_p
        and getattr(graph, "hyb", None) is not None
    ):
        # the hybrid plan exists only when the per-GRAPH census (or a
        # measured spmm_hyb verdict) accepted streaming — that per-graph
        # decision outranks the bucket-interpolated xla crossover below,
        # which knows nothing about this graph's locality
        return "hybrid"
    if use_p and backend == "auto":
        # latency-floor crossover (graph-build-time table decision): below
        # the measured floor the XLA reference path wins outright
        pref = graph.prefer_dyn if dynamic_w else graph.prefer
        if pref == "xla":
            use_p = False
    # measured-table layout preference (Graph.prefer / .prefer_dyn): the
    # sweep's static/dynamic spmm winners decide BAT vs slot per graph
    have_slot = graph.plan is not None
    use_bat = use_p and graph.bat is not None
    static_w = not dynamic_w and graph.edge_weight is not None
    if in_sum and static_w and use_p and graph.bat_b is not None:
        return "bucketed"
    if (
        in_sum
        and static_w
        and use_bat
        and (graph.prefer.startswith("bat") or not have_slot or graph.w_slots is None)
    ):
        return "bat_static"
    if in_sum and not dynamic_w and graph.w_slots is not None and use_p:
        return "slot_static"
    if not dynamic_w and graph.edge_weight is None:
        if use_p and graph.bat_b is not None:
            return "bucketed"
        if use_bat and (graph.prefer.startswith("bat") or not have_slot):
            return "bat"
        return "slot" if use_p else "xla"
    if use_bat and (graph.prefer_dyn.startswith("bat") or not have_slot):
        return "bat_dyn"
    return "slot_dyn" if use_p else "xla"


def segment_spmm(
    graph: Graph,
    x: jax.Array,
    edge_weight: Optional[jax.Array] = None,
    *,
    reduce: str = "sum",
    backend: str = "auto",
) -> jax.Array:
    """Model-facing fused SpMM over a prebuilt Graph (the role of
    `message_and_aggregate` + GeoT SpMM in the reference conv layers,
    `models/conv/spmm.py:5-14`)."""
    w = edge_weight if edge_weight is not None else graph.edge_weight
    use_p = _use_pallas(backend) and reduce in ("sum", "mean")
    path = dispatch_path(
        graph, dynamic_w=edge_weight is not None, reduce=reduce,
        backend=backend,
    )
    if path == "hybrid":
        # community-structured graphs: gather-free streamed cells + BAT
        # remainder (weights baked at build; covers weighted and unweighted)
        out = _make_spmm_hybrid()(x, graph.hyb, graph.hyb_t)
    elif path == "bucketed":
        # big-table static path: bucketed BAT (sliced-table gather)
        out = _make_spmm_bucketed()(x, graph.bat_b, graph.bat_b_t)
    elif path == "bat_static":
        # static weights: edge order IS the kernel's input order under BAT,
        # with a precomputed transpose-order copy for backward
        out = _make_gws_bat(True, True)(
            x, graph.edge_weight, graph.src, graph.dst, graph.dst_t,
            graph.edge_weight_t, graph.bat, graph.bat_t,
        )
    elif path == "slot_static":
        # static-weight fast path: slot weights cached at graph build
        out = _make_gws_static(True)(
            x, graph.plan, graph.plan_t, graph.w_slots, graph.w_slots_t
        )
    elif path == "bat":
        out = _make_gs_bat(True)(
            x, graph.src, graph.dst, graph.dst_t, graph.bat, graph.bat_t
        )
    elif path == "slot":
        out = _make_gs(True)(
            x, graph.src, graph.dst, graph.plan, graph.plan_t, graph.perm_t
        )
    elif path == "bat_dyn":
        out = _make_gws_bat(True, False)(
            x, w, graph.src, graph.dst, graph.dst_t, graph.perm_t,
            graph.bat, graph.bat_t,
        )
    elif path == "slot_dyn":
        out = _make_gws(True)(
            x, w, graph.src, graph.dst, graph.plan, graph.plan_t,
            graph.edge_pos_t,
        )
    elif w is None:
        out = ref.gather_scatter_ref(
            graph.src, graph.dst, x, graph.num_nodes, "sum"
        )
    else:
        out = ref.gather_weight_scatter_ref(
            graph.src, graph.dst, w, x, graph.num_nodes, "sum"
        )
    if reduce == "sum":
        return out
    if reduce == "mean":
        if use_p and (graph.plan is not None or graph.bat is not None):
            return _apply_reduce_post(
                out, graph.plan if graph.plan is not None else graph.bat,
                "mean", backend,
            )
        deg = (
            jnp.zeros(graph.num_nodes, x.dtype).at[graph.dst].add(1.0, mode="drop")
        )
        return out / jnp.maximum(deg, 1.0)[:, None]
    # max/min/prod: reference backend only
    if w is None:
        return ref.gather_scatter_ref(graph.src, graph.dst, x, graph.num_nodes, reduce)
    return ref.gather_weight_scatter_ref(
        graph.src, graph.dst, w, x, graph.num_nodes, reduce
    )


def csr_gws(
    csrptr: jax.Array,
    col: jax.Array,
    weight: jax.Array,
    src: jax.Array,
    *,
    num_rows: Optional[int] = None,
    graph: Optional[Graph] = None,
    backend: str = "auto",
) -> jax.Array:
    """CSR group-wise-scheduled SpMM (reference `geot/csr_gws.py:3-37`,
    kernel `csrc/cuda/csr_gws_kernel.cuh:12-187`). The SegmentPlan *is* the
    nnz-balanced group-wise schedule on TPU (equal-edge tiles + window-
    confined rows), so with a prebuilt `graph` this is the same plan path;
    otherwise rows are recovered from the rowptr and the reference backend
    runs."""
    if num_rows is None:
        num_rows = int(csrptr.shape[0]) - 1
    if graph is not None and _use_pallas(backend):
        # the graph's own plan IS the schedule — the caller's matrix must
        # be the one the graph was built from (same trust contract as the
        # reference, but fail loudly on an obvious mismatch)
        if int(col.shape[0]) != int(graph.num_edges) or num_rows > int(
            graph.num_nodes
        ):
            raise ValueError(
                f"csr_gws(graph=...): csr has nnz={int(col.shape[0])}, "
                f"rows={num_rows} but the graph's plan covers "
                f"nnz={int(graph.num_edges)}, nodes={int(graph.num_nodes)} "
                "— pass the graph the matrix was built from"
            )
        return gather_weight_scatter(
            col, graph.dst, weight, src, num_rows, graph=graph, backend=backend
        )
    return ref.csr_spmm_ref(csrptr, col, weight, src)


def mh_spmm(
    src_index: jax.Array,
    dst_index: jax.Array,
    weight: jax.Array,
    src: jax.Array,
    num_segments: int,
    *,
    reduce: str = "sum",
    graph: Optional[Graph] = None,
    backend: str = "auto",
) -> jax.Array:
    """Multi-head SpMM for GAT-style attention: src [nodes, H, D],
    weight [nnz, H] (edge-major). Reference: `geot/mh_spmm.py:4-8`,
    kernel `csrc/cuda/mh_spmm_kernel.cuh:28-213`."""
    if reduce != "sum":
        raise ValueError("mh_spmm supports sum (matching the reference kernel)")
    if graph is not None and _use_pallas(backend):
        return _make_mh(True)(
            src, weight, graph.src, graph.dst, graph.plan, graph.plan_t, graph.perm_t
        )
    return ref.mh_spmm_ref(src_index, dst_index, weight, src, num_segments)


def mh_spmm_transposed(
    src_index: jax.Array,
    dst_index: jax.Array,
    weight_t: jax.Array,
    src: jax.Array,
    num_segments: int,
    **kw,
) -> jax.Array:
    """Head-major weights [H, nnz] (reference `geot/mh_spmm.py:10-12`
    transposes then calls the edge-major op)."""
    return mh_spmm(src_index, dst_index, weight_t.T, src, num_segments, **kw)


@functools.lru_cache(maxsize=None)
def _make_mh_slot(use_pallas: bool, head_dim: int):
    """Differentiable slot-space multi-head weighted segment sum:
    (vals [T*E, H*D] slot-ordered, w [T*E, H] slot-ordered) → [S_pad, H*D].
    The composable primitive behind the fused GAT path — backward is pure
    gathers, so JAX autodiff composes through the softmax around it.
    head_dim is closed over (must stay trace-static for the kernel grid)."""

    @jax.custom_vjp
    def f(vals, w, plan):
        if use_pallas:
            return plan_segment_sum_mh(plan, vals, w, head_dim)
        te, HD = vals.shape
        H = w.shape[1]
        vw = vals.reshape(te, H, HD // H) * w[:, :, None].astype(vals.dtype)
        return (
            jnp.zeros((plan.padded_segments, H, HD // H), jnp.float32)
            .at[plan.dst_slots.reshape(-1)]
            .add(vw, mode="drop")
            .reshape(plan.padded_segments, HD)
            .astype(vals.dtype)
        )

    def fwd(vals, w, plan):
        return f(vals, w, plan), (vals, w, plan)

    def bwd(res, g):
        vals, w, plan = res
        te, HD = vals.shape
        H = w.shape[1]
        gs = g[plan.dst_slots.reshape(-1)]  # [T*E, H*D]
        g3 = gs.reshape(te, H, HD // H)
        dvals = (g3 * w[:, :, None].astype(g3.dtype)).reshape(te, HD)
        dw = jnp.sum(g3 * vals.reshape(te, H, HD // H), axis=-1).astype(w.dtype)
        return (dvals, dw, None)

    f.defvjp(fwd, bwd)
    return f


def gat_attention_spmm(
    graph: Graph,
    xh: jax.Array,
    alpha_src: jax.Array,
    alpha_dst: jax.Array,
    *,
    negative_slope: float = 0.2,
    backend: str = "auto",
) -> jax.Array:
    """Fused GAT attention + multi-head aggregation, computed in slot space.

    xh: [nodes, H, D] transformed features; alpha_src/alpha_dst: [nodes, H]
    per-node attention terms. Equivalent to
    `segment_softmax(leaky_relu(a_s[src]+a_d[dst]), dst)` feeding `mh_spmm`,
    but logits, softmax, and weights never exist in edge order — everything
    is produced directly in the plan's slot layout, eliminating the runtime
    nnz-scalar permutation (the same cost hoisted for static weights in
    `geot_tpu.graph.structures`). Fully differentiable.
    """
    plan = graph.plan
    H = alpha_src.shape[1]
    D = xh.shape[-1]
    n_nodes = graph.num_nodes
    use_p = _use_pallas(backend)
    # softmax statistics in EDGE space — [nodes, H] results, with the
    # [nnz, H] logits a fusable transient (H ≪ H·D); segment max/sum over
    # the dst-sorted edge list are cheap sorted-segment reductions
    logit_e = jax.nn.leaky_relu(
        alpha_src[graph.src] + alpha_dst[graph.dst], negative_slope
    )  # [nnz, H]
    m = jax.ops.segment_max(
        logit_e, graph.dst, n_nodes, indices_are_sorted=True
    )
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    s = jax.ops.segment_sum(
        jnp.exp(logit_e - m[graph.dst]),
        graph.dst,
        n_nodes,
        indices_are_sorted=True,
    )
    if graph.num_edges > int(
        os.environ.get("GEOT_GAT_FUSED_MAX_EDGES", 8_000_000)
    ):
        # reddit2-scale: the fully-fused slot-space program exceeds HBM at
        # compile time (16.6 GB program, campaign-r5 models_reddit2 log) —
        # compose the edge-space softmax with a separate aggregation.
        # Aggregation choice measured at reddit2 (H=4): D=8 the XLA
        # materialized [nnz, H, D] path wins (model fwd 4.58 s vs 5.78 s
        # with the chunked kernel — slot gathers are issue-bound at 32
        # lanes); D>=16 the materialization OOMs the chip and the
        # chunk-streamed kernel is the only path that runs.
        att = jnp.exp(logit_e - m[graph.dst]) / jnp.maximum(
            s[graph.dst], 1e-16
        )
        agg_backend = "reference" if H * D < 64 else backend
        return mh_spmm(
            graph.src, graph.dst, att.astype(xh.dtype), xh, n_nodes,
            graph=graph, backend=agg_backend,
        )
    pad_rows = plan.padded_segments - n_nodes
    m_pad = jnp.pad(m, ((0, pad_rows), (0, 0)))
    s_pad = jnp.pad(s, ((0, pad_rows), (0, 0)), constant_values=1.0)
    a_dst_pad = jnp.pad(alpha_dst, ((0, pad_rows), (0, 0)))
    xflat = xh.reshape(-1, H * D)

    # aggregation chunk-streamed in slot space: attention weights are
    # produced directly in the plan's slot layout (no nnz-scalar
    # permutation), one chunk's [chunk_slots, H*D] gather live at a time
    def run_one(cp, t0, t1, w0, token):
        sflat = cp.src_slots.reshape(-1)
        dglob = cp.dst_slots.reshape(-1) + w0 * plan.s_tile
        mask = cp.mask.reshape(-1)
        lg = jax.nn.leaky_relu(
            alpha_src[sflat] + a_dst_pad[dglob], negative_slope
        )
        att = (
            jnp.exp(lg - m_pad[dglob])
            / jnp.maximum(s_pad[dglob], 1e-16)
            * mask[:, None].astype(lg.dtype)
        )
        vals = _gated(xflat, token)[sflat]
        out = _make_mh_slot(use_p, D)(vals, att.astype(vals.dtype), cp)
        return out[: cp.num_segments]

    out = _plan_sum_chunked(plan, run_one)
    return out[:n_nodes].reshape(n_nodes, H, D)


def segment_softmax(
    logits: jax.Array,
    index: jax.Array,
    num_segments: int,
    *,
    indices_are_sorted: bool = True,
) -> jax.Array:
    """Softmax of per-edge logits within each destination segment — the
    attention normalization feeding `mh_spmm` in GAT-style models (the
    reference reaches it through PyG's `softmax` before its mh_spmm pattern,
    `geot/match_replace/fused_mh_spmm.py:4-50`).

    logits: [nnz] or [nnz, H]; index: [nnz] dst ids (sorted ascending).
    Numerically stabilized by per-segment max subtraction. Cheap relative to
    the SpMM (O(nnz·H) elementwise + two segment reductions), so it runs on
    the XLA reference path.
    """
    m = jax.ops.segment_max(
        logits, index, num_segments, indices_are_sorted=indices_are_sorted
    )
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.exp(logits - m[index])
    s = jax.ops.segment_sum(
        e, index, num_segments, indices_are_sorted=indices_are_sorted
    )
    return e / jnp.maximum(s, 1e-16)[index]


def _sddmm_bat_fwd(bp, a: jax.Array, b: jax.Array, src: jax.Array) -> jax.Array:
    """Per-edge dots via the BAT SDDMM kernel: the a-side (dst) rows
    stream as output-window blocks selected on the MXU (no gather); only
    the b-side keeps a (fast-size) row gather. Returns [nnz] f32-accurate
    dots in edge order."""
    from geot_tpu.ops.pallas_segment import sddmm_bat

    n = a.shape[1]
    f_tile = _pick_f_tile(n)
    f_pad = _round_up(max(n, 1), f_tile)
    # a rows pad to the plan's window blocks + chunk-margin windows (pad
    # tiles from chunk uniformization may point past n_blocks)
    margin = bp.chunk_blocks if bp.chunks else 0
    rows_a = (bp.n_blocks + margin) * bp.s_tile
    a_p = jnp.pad(a, ((0, rows_a - a.shape[0]), (0, f_pad - n)))
    g_size = bp.n_vblocks * bp.e_tile
    if g_size % 1024 == 0:
        g_size += 512  # fast-emitter gather size (see _bat_sum_scan)
    idx = jnp.pad(src, (0, g_size - src.shape[0]))
    b_vals = b[idx]
    if f_pad != n:
        b_vals = jnp.pad(b_vals, ((0, 0), (0, f_pad - n)))
    out = sddmm_bat(bp, a_p, b_vals, f_tile=f_tile)
    return out[: src.shape[0]]


def sddmm_coo(
    src_index: jax.Array,
    dst_index: jax.Array,
    a: jax.Array,
    b: jax.Array,
    *,
    graph: Optional[Graph] = None,
    backend: str = "auto",
) -> jax.Array:
    """Per-edge dot product out[e] = <a[dst[e]], b[src[e]]> (reference
    `sddmm_coo_impl`, kernels `csrc/cuda/sddmm_coo_kernel.cuh:3-210`).

    With a prebuilt `graph` (edges dst-sorted, BAT plan present) the
    Pallas BAT SDDMM kernel runs on TPU: round-5 measurement showed XLA's
    fused two-gather version reaches only ~9% of HBM peak at arxiv N=128
    (`results/benchop_sddmm.csv`) because materialized row gathers are
    issue-bound; streaming the dst-side rows as window blocks removes one
    of the two gathers. Falls back to the XLA reference off-TPU, without a
    graph, or past the single-gather transient budget."""
    if (
        graph is not None
        and graph.bat is not None
        and _use_pallas(backend)
        # campaign-r5 sddmm grid: the kernel wins every >=1M-edge point at
        # N=128 (arxiv 2.36x, collab 1.73x, ppi 1.51x) but loses most
        # N=32 cells to the fused XLA gather (flickr 0.67x) — lane
        # utilisation of the window-block dot is too low below ~64 lanes,
        # so auto keeps XLA there; backend="pallas" still forces it
        and (b.shape[1] >= 64 or backend == "pallas")
        and src_index.shape[0] * max(b.shape[1], 128) * 4
        <= int(os.environ.get("GEOT_SDDMM_MAX_BYTES", 4 << 30))
    ):
        return _sddmm_bat_fwd(graph.bat, a, b, src_index)
    return ref.sddmm_coo_ref(src_index, dst_index, a, b)
