"""Tiled segment-reduction execution plan.

This is the TPU-native replacement for GeoT's atomic-scatter CUDA schedules
(reference: `csrc/cuda/index_scatter_kernel.cuh:48-201`, the PR/SR sorted
segment-reduce kernels, and the nnz-balanced CSR group-wise schedule of
`csrc/cuda/csr_gws_kernel.cuh:12-187`). TPUs have no atomics and Pallas TPU
grids execute sequentially per core, so instead of atomicAdd at segment
boundaries we precompute a static *plan* that partitions the dst-sorted edge
list into fixed-size tiles such that:

  * every tile holds exactly ``e_tile`` edge slots (padded with masked slots),
  * all edges in a tile target segments inside one aligned output window
    ``[out_block*s_tile, (out_block+1)*s_tile)``,
  * tiles are ordered by ``out_block`` (dst-sorted edges make this free), so
    all tiles contributing to an output window are consecutive — the Pallas
    kernel accumulates them in VMEM across sequential grid steps and flushes
    each output block exactly once. Deterministic by construction.

Inside a tile the reduction is a one-hot matmul on the MXU:
``P[s, :] = sum_e [dst_e - base == s] * w_e * v_e`` — an
``(s_tile × e_tile) @ (e_tile × f_tile)`` contraction, which is the TPU
idiom for scatter-add (also used for MoE dispatch).

The plan is built once per graph (host-side numpy or jit-compatible jnp),
amortized across training steps — analogous to GeoT's one-time
``coo_to_csr`` format transform (`geot/match_replace/format_transform.py:5-40`)
but carrying the full schedule, which replaces the decision-tree launch
rules (`csrc/cuda/wrapper/index_scatter_rule.h`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "SegmentPlan",
    "build_segment_plan",
    "build_segment_plan_host",
    "plan_from_host",
    "plan_tile_bounds",
    "compute_chunks",
]


def _cdiv(a, b):
    return -(-a // b)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SegmentPlan:
    """Static execution plan for tiled sorted-segment reduction.

    Array fields (pytree leaves), with T = number of tiles, E = e_tile:
      src_slots: [T, E] int32 — source node id per edge slot (0 on padding).
      dst_slots: [T, E] int32 — destination segment id per slot; padding
        slots point at the tile's window base so their local id is 0.
      edge_pos:  [T, E] int32 — index into the caller's (dst-sorted) edge
        arrays for each slot (0 on padding; combine with `mask`).
      mask:      [T, E] float32 — 1.0 for real edges, 0.0 for padding.
      out_block: [T]    int32 — output window index; window w covers output
        rows [w*s_tile, (w+1)*s_tile). Non-decreasing over tiles, and every
        window in [0, n_blocks) appears at least once (coverage).

    Static metadata (aux data — hashable, participates in jit caching):
      e_tile, s_tile, num_segments, n_blocks, num_edges, num_src_nodes.
    """

    src_slots: jax.Array
    dst_slots: jax.Array
    edge_pos: jax.Array
    mask: jax.Array
    out_block: jax.Array
    e_tile: int = dataclasses.field(metadata=dict(static=True))
    s_tile: int = dataclasses.field(metadata=dict(static=True))
    num_segments: int = dataclasses.field(metadata=dict(static=True))
    n_blocks: int = dataclasses.field(metadata=dict(static=True))
    num_edges: int = dataclasses.field(metadata=dict(static=True))
    num_src_nodes: int = dataclasses.field(metadata=dict(static=True))
    # layout preference from the tuning layer: 'auto' | 'sr' | 'pr'
    mode_hint: str = dataclasses.field(default="auto", metadata=dict(static=True))
    # streaming-execution chunks: ((t0, t1, w0, w1), ...) — tile range
    # [t0,t1) covering output windows [w0,w1), window-aligned so chunk
    # outputs are disjoint and concatenate to the full result. Empty tuple
    # = single chunk. Bounds the [chunk_slots, F] gather materialization so
    # reddit2/products-scale graphs fit in HBM.
    chunks: tuple = dataclasses.field(default=(), metadata=dict(static=True))
    # with uniform chunks: every chunk spans exactly this many output
    # windows (outputs padded; stitching slices the real rows). 0 = chunks
    # are ragged (legacy) or absent.
    chunk_blocks: int = dataclasses.field(default=0, metadata=dict(static=True))
    # aligned-edge-block (AEB) loader support: e0[t] = edge index of slot 0
    # of tile t, so slot j holds edge e0[t]+j (pads/leads masked). Lets the
    # kernel read per-edge values/weights directly from EDGE order via two
    # adjacent aligned blocks + an in-kernel roll — no slot gather, no
    # runtime nnz permutation (the reference reads edge order natively,
    # `csrc/cuda/gather_weight_scatter_kernel.cuh:20-185`).
    e0: Optional[jax.Array] = None
    # number of e_tile-sized blocks a value/weight array must be padded to
    # for the AEB loader ((max(e0)//e_tile)+2)
    n_value_blocks: int = dataclasses.field(default=0, metadata=dict(static=True))
    # window starts are aligned to this many edges (packed layouts need
    # 128//n_feat | pack_align so row-rolls stay integral)
    pack_align: int = dataclasses.field(default=1, metadata=dict(static=True))
    # k-major copies of dst_slots/mask for the packed kernels (sub-position
    # k of packed row r at lane k*rows+r), precomputed host-side for
    # km_pack = 128//packed_width(feature_hint); trace-time fallback
    # otherwise. Shape [T, 1, e_tile].
    dst_km: Optional[jax.Array] = None
    mask_km: Optional[jax.Array] = None
    km_pack: int = dataclasses.field(default=0, metadata=dict(static=True))

    @property
    def num_tiles(self) -> int:
        return self.src_slots.shape[0]

    @property
    def padded_segments(self) -> int:
        return self.n_blocks * self.s_tile

    @property
    def padding_ratio(self) -> float:
        total = self.num_tiles * self.e_tile
        return float(total - self.num_edges) / float(max(self.num_edges, 1))

    def gather_edge_values(self, edge_vals: jax.Array) -> jax.Array:
        """Permute caller-order per-edge values into slot order, zeroing pads.

        edge_vals: [num_edges, ...] → [T, E, ...]
        """
        flat = edge_vals[self.edge_pos.reshape(-1)]
        flat = flat.reshape(self.edge_pos.shape + edge_vals.shape[1:])
        m = self.mask.reshape(self.mask.shape + (1,) * (edge_vals.ndim - 1))
        return flat * m.astype(flat.dtype)


# hard cap on tiles per chunk: the kernel's scalar-prefetched out_block
# (int32 per tile) must fit in SMEM (~64KB); 8192 tiles = 32KB leaves room
MAX_PREFETCH_TILES = 8192


def compute_chunks(
    out_block: np.ndarray, max_tiles_per_chunk: int
) -> tuple:
    """Window-aligned chunk boundaries: greedy tile ranges of at most
    `max_tiles_per_chunk`, cut at the last window start within the limit
    (a window's tiles never straddle chunks, so chunk outputs are disjoint)."""
    max_tiles_per_chunk = min(
        max(max_tiles_per_chunk, 1), MAX_PREFETCH_TILES
    )
    T = len(out_block)
    if max_tiles_per_chunk <= 0 or T <= max_tiles_per_chunk:
        return ()
    # first tile of each window
    first = np.concatenate([[0], np.nonzero(np.diff(out_block))[0] + 1])
    chunks = []
    t0 = 0
    while t0 < T:
        limit = t0 + max_tiles_per_chunk
        if limit >= T:
            t1 = T
        else:
            # last window start <= limit
            k = np.searchsorted(first, limit, side="right") - 1
            t1 = int(first[k])
            if t1 <= t0:
                # a single window (hub destination) larger than the chunk
                # limit: cut MID-WINDOW — consecutive chunks then share the
                # boundary window and the executor add-combines the overlap
                t1 = limit
        w0, w1 = int(out_block[t0]), int(out_block[t1 - 1]) + 1
        chunks.append((int(t0), int(t1), w0, w1))
        t0 = t1
    return tuple(chunks) if len(chunks) > 1 else ()


def _uniformize_chunks(arrays: dict, meta: dict) -> None:
    """Pad every chunk to identical (tile count, window count) so all chunk
    kernels share ONE compiled executable — with ragged chunks a
    products-scale program compiles ~70 distinct Mosaic kernels (an hour
    over a dev tunnel); uniform chunks compile one.

    Rewrites `arrays` in place to [n_chunks*T_max, E] with masked padding
    tiles covering the extra windows, and sets meta['chunks'] (REAL window
    ranges, for stitching) and meta['chunk_blocks'] = W_max."""
    chunks = meta["chunks"]
    if not chunks:
        return
    e_tile = meta["e_tile"]
    s_tile = meta["s_tile"]
    T_max = max(t1 - t0 for t0, t1, _, _ in chunks)
    W_max = max(w1 - w0 for _, _, w0, w1 in chunks)
    n_c = len(chunks)
    ob = arrays["out_block"]
    new = {
        k: np.zeros((n_c * T_max,) + v.shape[1:], v.dtype)
        for k, v in arrays.items()
    }
    new_chunks = []
    for i, (t0, t1, w0, w1) in enumerate(chunks):
        nt = t1 - t0
        base = i * T_max
        for k, v in arrays.items():
            new[k][base : base + nt] = v[t0:t1]
        # padding tiles: cover windows [w1, w0+W_max) once each (so every
        # output block of the padded range is initialized), then repeat the
        # final window; all slots masked out
        pad_windows = list(range(w1, w0 + W_max))
        pad_ob = pad_windows + [w0 + W_max - 1] * (T_max - nt - len(pad_windows))
        pad_ob = pad_ob[: T_max - nt]
        if len(pad_ob) < T_max - nt:  # more pad tiles than new windows
            pad_ob = pad_ob + [w0 + W_max - 1] * (T_max - nt - len(pad_ob))
        new["out_block"][base + nt : base + T_max] = np.asarray(pad_ob, ob.dtype)
        new["dst_slots"][base + nt : base + T_max] = (
            np.asarray(pad_ob, np.int64)[:, None] * s_tile
        ).astype(new["dst_slots"].dtype)
        if "e0" in arrays and nt > 0:
            # pad tiles inherit the last real tile's e0 so chunk-local
            # rebasing (e0 - chunk_base) stays non-negative and in-bounds
            new["e0"][base + nt : base + T_max] = arrays["e0"][t1 - 1]
        new_chunks.append((base, base + T_max, int(w0), int(w1)))
    arrays.update(new)
    meta["chunks"] = tuple(new_chunks)
    meta["chunk_blocks"] = int(W_max)


def plan_tile_bounds(num_edges: int, num_segments: int, e_tile: int, s_tile: int) -> int:
    """Static upper bound on the number of tiles a plan can need.

    Each output window adds at most one partially-filled tile, plus one tile
    per full e_tile of edges, and empty windows get one coverage tile each.
    """
    n_blocks = max(_cdiv(max(num_segments, 1), s_tile), 1)
    return _cdiv(num_edges, e_tile) + n_blocks


def build_segment_plan_host(
    dst: np.ndarray,
    src: Optional[np.ndarray],
    num_segments: int,
    *,
    e_tile: int = 256,
    s_tile: int = 256,
    num_src_nodes: Optional[int] = None,
    mode_hint: str = "auto",
    max_chunk_slots: int = 4 << 20,
    pack_align: int = 16,
):
    """Like `build_segment_plan` but returns (host_arrays: dict of numpy,
    static_meta: dict) without touching the device — callers that derive
    more host-side data from the slot arrays (cached slot weights, stats)
    avoid a device round-trip on multi-GB plans.

    Args:
      dst: [nnz] destination segment ids, MUST be sorted ascending (the same
        contract as GeoT's `sorted=True` path, `geot/index_scatter.py:5-8`).
      src: [nnz] source node ids, or None (index_scatter-style use where
        values are given per edge directly).
      num_segments: static number of output segments. (GeoT sizes the output
        from `index[-1]+1` at runtime, `csrc/index_scatter.cpp:15`; on TPU
        the output shape must be trace-static, so it is an argument.)
      e_tile: edge slots per tile.
      s_tile: output window size (rows per output block).
    """
    dst = np.asarray(dst)
    nnz = int(dst.shape[0])
    if nnz > 1 and not bool(np.all(dst[1:] >= dst[:-1])):
        raise ValueError("dst must be sorted ascending; use sort_edges_by_dst first")
    if nnz and int(dst[-1]) >= num_segments:
        raise ValueError(
            f"dst contains id {int(dst[-1])} >= num_segments={num_segments}"
        )
    if src is None:
        src_arr = np.zeros(nnz, dtype=np.int32)
        n_src = 1
    else:
        src_arr = np.asarray(src, dtype=np.int32)
        n_src = int(num_src_nodes) if num_src_nodes is not None else (
            int(src_arr.max()) + 1 if nnz else 1
        )

    n_blocks = max(_cdiv(max(num_segments, 1), s_tile), 1)
    pack_align = max(int(pack_align), 1)
    while e_tile % pack_align:
        pack_align //= 2

    meta = dict(
        e_tile=int(e_tile),
        s_tile=int(s_tile),
        num_segments=int(num_segments),
        n_blocks=n_blocks,
        num_edges=nnz,
        num_src_nodes=n_src,
        mode_hint=mode_hint,
        pack_align=int(max(pack_align, 1)),
    )

    # native (C++, multithreaded) slot-array construction when available —
    # the numpy path below is the reference implementation and fallback
    # (equality is tested in tests/test_native.py). The native builder
    # implements pack_align==1 layout only.
    nat = None
    if max(pack_align, 1) == 1:
        from geot_tpu import native as _native

        nat = _native.build_plan_arrays(
            dst.astype(np.int32), None if src is None else src_arr,
            num_segments, e_tile, s_tile,
        )
    if nat is not None:
        src_sl, dst_sl, ep, mk, ob = nat
        # AEB invariant (pack_align==1): slot j of tile t holds edge
        # e0[t]+j; all tiles of a window are full except the last, so e0 is
        # the exclusive cumsum of per-tile real-edge counts.
        n_real = mk.sum(axis=1).astype(np.int64)
        e0 = np.concatenate([[0], np.cumsum(n_real)[:-1]]).astype(np.int32)
        meta["n_value_blocks"] = int(e0.max() if len(e0) else 0) // e_tile + 2
        meta["chunks"] = compute_chunks(ob, max_chunk_slots // e_tile)
        arrays = dict(src_slots=src_sl, dst_slots=dst_sl, edge_pos=ep,
                      mask=mk, out_block=ob, e0=e0)
        _uniformize_chunks(arrays, meta)
        return arrays, meta

    pack = max(int(pack_align), 1)
    block_of_edge = dst // s_tile if nnz else np.zeros(0, dtype=np.int64)
    cnt = np.bincount(block_of_edge, minlength=n_blocks).astype(np.int64)
    edge_start_of_block = np.zeros(n_blocks + 1, dtype=np.int64)
    np.cumsum(cnt, out=edge_start_of_block[1:])
    # pack alignment: window w's slot space starts at the pack-aligned edge
    # index below its first edge; the first `lead` slots are padding so that
    # e0 (edge of slot 0) is always a multiple of pack — packed layouts
    # (128//n_feat edges per lane row) can then roll whole rows.
    lead = (edge_start_of_block[:-1] % pack).astype(np.int64)
    # >=1 tile per window: empty windows still get a coverage (all-pad) tile
    # so the Pallas kernel initializes every output block.
    tiles_per_block = np.maximum(_cdiv(cnt + lead, e_tile), 1)
    tile_start = np.zeros(n_blocks + 1, dtype=np.int64)
    np.cumsum(tiles_per_block, out=tile_start[1:])
    num_tiles = int(tile_start[-1])

    out_block = np.repeat(np.arange(n_blocks, dtype=np.int32), tiles_per_block)
    seg_base = out_block.astype(np.int64) * s_tile

    # e0 per tile: aligned window start + tile offset within the window
    ks = np.arange(num_tiles, dtype=np.int64) - tile_start[out_block]
    aligned_start = edge_start_of_block[:-1] - lead
    e0 = (aligned_start[out_block] + ks * e_tile).astype(np.int32)

    # default (padding) slot contents
    dst_slots = np.repeat(seg_base, e_tile).reshape(num_tiles, e_tile)
    src_slots = np.zeros((num_tiles, e_tile), dtype=np.int32)
    edge_pos = np.zeros((num_tiles, e_tile), dtype=np.int32)
    mask = np.zeros((num_tiles, e_tile), dtype=np.float32)

    if nnz:
        p = (
            np.arange(nnz, dtype=np.int64)
            - edge_start_of_block[block_of_edge]
            + lead[block_of_edge]
        )
        slot = (tile_start[block_of_edge] + p // e_tile) * e_tile + p % e_tile
        dst_flat = dst_slots.reshape(-1)
        dst_flat[slot] = dst
        src_slots.reshape(-1)[slot] = src_arr
        edge_pos.reshape(-1)[slot] = np.arange(nnz, dtype=np.int32)
        mask.reshape(-1)[slot] = 1.0

    meta["n_value_blocks"] = int(e0.max() if len(e0) else 0) // e_tile + 2
    meta["chunks"] = compute_chunks(out_block, max_chunk_slots // e_tile)
    arrays = dict(
        src_slots=src_slots.astype(np.int32),
        dst_slots=dst_slots.astype(np.int32),
        edge_pos=edge_pos.astype(np.int32),
        mask=mask.astype(np.float32),
        out_block=out_block.astype(np.int32),
        e0=e0,
    )
    _uniformize_chunks(arrays, meta)
    return arrays, meta


def _k_major_host(arr: np.ndarray, pack: int) -> np.ndarray:
    """[T, E] slot array → k-major [T, 1, E] (lane k*rows+r holds slot
    r*pack+k) for the packed kernels."""
    T, E = arr.shape
    rows = E // pack
    return np.ascontiguousarray(
        arr.reshape(T, rows, pack).transpose(0, 2, 1).reshape(T, 1, E)
    )


def plan_from_host(arrays: dict, meta: dict, km_pack: int = 0) -> SegmentPlan:
    km = {}
    if km_pack > 1 and meta["e_tile"] % km_pack == 0:
        km = dict(
            dst_km=jnp.asarray(_k_major_host(arrays["dst_slots"], km_pack)),
            mask_km=jnp.asarray(_k_major_host(arrays["mask"], km_pack)),
            km_pack=int(km_pack),
        )
    return SegmentPlan(
        src_slots=jnp.asarray(arrays["src_slots"]),
        dst_slots=jnp.asarray(arrays["dst_slots"]),
        edge_pos=jnp.asarray(arrays["edge_pos"]),
        mask=jnp.asarray(arrays["mask"]),
        out_block=jnp.asarray(arrays["out_block"]),
        e0=jnp.asarray(arrays["e0"]) if "e0" in arrays else None,
        **km,
        **meta,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BatPlan:
    """Block-aligned-tile execution plan (v3 kernels).

    A tile is an (output window, value block) incidence: the kernel loads
    value block ``vblock[t]`` (e_tile consecutive EDGES of the caller's
    dst-sorted arrays — a raw aligned block, no gather, no roll) and reduces
    it into window ``out_block[t]``. Edges of the block belonging to other
    windows produce window-local ids outside [0, s_tile) and match no
    one-hot row, so they drop out with no masking; tiles are ordered by
    window so the accumulate/flush-once logic is unchanged. Per-edge data
    (dst ids, weights) is likewise read as raw blocks — per-call edge
    weights cost nothing beyond streaming them.

    dst3: [n_vblocks, 1, e_tile] int32 — dst ids, -1 padded (host-built).
    dst_km/mask_km: optional k-major per-tile arrays for the packed kernel
      (km_pack = pack; mask_km is 1.0 on real in-window edges).
    chunks: as SegmentPlan ((t0, t1, w0, w1) ranges over tiles/windows).
    """

    out_block: jax.Array  # [T] int32, non-decreasing
    vblock: jax.Array  # [T] int32
    dst3: jax.Array
    dst_km: Optional[jax.Array]
    mask_km: Optional[jax.Array]
    e_tile: int = dataclasses.field(metadata=dict(static=True))
    s_tile: int = dataclasses.field(metadata=dict(static=True))
    num_segments: int = dataclasses.field(metadata=dict(static=True))
    n_blocks: int = dataclasses.field(metadata=dict(static=True))
    num_edges: int = dataclasses.field(metadata=dict(static=True))
    n_vblocks: int = dataclasses.field(metadata=dict(static=True))
    km_pack: int = dataclasses.field(default=0, metadata=dict(static=True))
    chunks: tuple = dataclasses.field(default=(), metadata=dict(static=True))
    chunk_blocks: int = dataclasses.field(default=0, metadata=dict(static=True))
    # max VALUE-BLOCK span of any chunk (host-measured): the scan executor
    # gathers only this many blocks per chunk instead of tiles+1 — tiles
    # outnumber value blocks by the window-crossing factor (~1.5x on sparse
    # residues), and every over-gathered row pays the full per-row cost
    # (round-5 probes: materialized row gathers are issue-bound)
    chunk_vblocks: int = dataclasses.field(default=0, metadata=dict(static=True))

    @property
    def num_tiles(self) -> int:
        return self.out_block.shape[0]

    @property
    def padded_segments(self) -> int:
        return self.n_blocks * self.s_tile


def build_bat_plan_host(
    dst: np.ndarray,
    num_segments: int,
    *,
    e_tile: int = 512,
    s_tile: int = 256,
    km_pack: int = 0,
    max_chunk_tiles: int = MAX_PREFETCH_TILES,
):
    """Host arrays + meta for a BatPlan over a dst-sorted edge list."""
    dst = np.asarray(dst, np.int64)
    nnz = int(dst.shape[0])
    if nnz > 1 and not bool(np.all(dst[1:] >= dst[:-1])):
        raise ValueError("dst must be sorted ascending; use sort_edges_by_dst first")
    if nnz and int(dst[-1]) >= num_segments:
        raise ValueError(
            f"dst contains id {int(dst[-1])} >= num_segments={num_segments}"
        )
    n_blocks = max(_cdiv(max(num_segments, 1), s_tile), 1)
    n_vblocks = max(_cdiv(nnz, e_tile), 1)

    nat = None
    if nnz:
        from geot_tpu import native as _native

        nat = _native.build_bat_tiles(dst, num_segments, e_tile, s_tile)
    if nat is not None:
        # native (C++, parallel over windows) incidence builder — the
        # numpy path below is the reference implementation and fallback
        # (equality tested in tests/test_native.py)
        ob, vb = nat
    else:
        win = dst // s_tile
        blk = np.arange(nnz, dtype=np.int64) // e_tile
        key = win * n_vblocks + blk  # lexicographic (win, blk); non-decreasing
        # key is already sorted: O(n) run-compaction, not np.unique's sort
        if nnz:
            head = np.empty(nnz, bool)
            head[0] = True
            np.not_equal(key[1:], key[:-1], out=head[1:])
            uniq = key[head]
        else:
            uniq = key
        ob = (uniq // n_vblocks).astype(np.int32)
        vb = (uniq % n_vblocks).astype(np.int32)
        # coverage tiles for empty windows (kernel must init every out block)
        missing = np.setdiff1d(
            np.arange(n_blocks, dtype=np.int32), ob, assume_unique=False
        )
        if len(missing):
            ob = np.concatenate([ob, missing])
            vb = np.concatenate([vb, np.zeros(len(missing), np.int32)])
            order = np.argsort(ob, kind="stable")
            ob, vb = ob[order], vb[order]
            # coverage tiles inherit the running block so vblock stays
            # non-decreasing (consecutive equal indices skip the DMA re-fetch)
            vb = np.maximum.accumulate(vb).astype(np.int32)

    # one extra all--1 dst block at index n_vblocks: the sentinel target for
    # pad tiles (chunk uniformization) — matches nothing, adds nothing
    dst_pad = np.full((n_vblocks + 1) * e_tile, -1, np.int32)
    dst_pad[:nnz] = dst
    dst3 = dst_pad.reshape(n_vblocks + 1, 1, e_tile)

    arrays = dict(out_block=ob, vblock=vb, dst3=dst3)
    if km_pack > 1 and e_tile % km_pack == 0:
        # packed kernel: k-major dst per VALUE BLOCK (indexed by vblock[t]
        # in the BlockSpec — no per-tile duplication); the -1 sentinel
        # drops phantom edges via the same no-match property
        arrays["dst_km"] = _k_major_host(
            dst_pad.reshape(n_vblocks + 1, e_tile), km_pack
        ).astype(np.int32)
    meta = dict(
        e_tile=int(e_tile),
        s_tile=int(s_tile),
        num_segments=int(num_segments),
        n_blocks=int(n_blocks),
        num_edges=nnz,
        n_vblocks=int(n_vblocks),
        km_pack=int(km_pack if km_pack > 1 and e_tile % km_pack == 0 else 0),
        chunks=compute_chunks(ob, max_chunk_tiles),
        chunk_blocks=0,
        chunk_vblocks=0,
    )
    _uniformize_bat_chunks(arrays, meta)
    return arrays, meta


def _uniformize_bat_chunks(arrays: dict, meta: dict) -> None:
    """Pad every chunk to identical (tiles, windows) so chunk kernels share
    one compiled executable (cf. `_uniformize_chunks`). Pad tiles cover the
    extra windows once each (coverage) with the chunk's last value block."""
    chunks = meta["chunks"]
    if not chunks:
        return
    ob, vb = arrays["out_block"], arrays["vblock"]
    T_max = max(t1 - t0 for t0, t1, _, _ in chunks)
    W_max = max(w1 - w0 for _, _, w0, w1 in chunks)
    n_c = len(chunks)
    new_ob = np.zeros(n_c * T_max, ob.dtype)
    new_vb = np.zeros(n_c * T_max, vb.dtype)
    new_chunks = []
    for i, (t0, t1, w0, w1) in enumerate(chunks):
        nt = t1 - t0
        base = i * T_max
        new_ob[base : base + nt] = ob[t0:t1]
        new_vb[base : base + nt] = vb[t0:t1]
        pad_windows = list(range(w1, w0 + W_max))
        pad_ob = (pad_windows + [w0 + W_max - 1] * T_max)[: T_max - nt]
        new_ob[base + nt : base + T_max] = np.asarray(pad_ob, ob.dtype)
        # pad tiles target the sentinel (-1) dst block so they can never
        # re-add a real block's edges to a real window
        new_vb[base + nt : base + T_max] = meta["n_vblocks"]
        new_chunks.append((base, base + T_max, int(w0), int(w1)))
    arrays["out_block"], arrays["vblock"] = new_ob, new_vb
    meta["chunks"] = tuple(new_chunks)
    meta["chunk_blocks"] = int(W_max)
    # max real value-block span over chunks (vblock is globally
    # non-decreasing over real tiles — window-spanning blocks repeat, never
    # dip — so span = last - first + 1); the scan executor gathers only
    # this many blocks per chunk (BatPlan.chunk_vblocks)
    vspan = 1
    for t0, t1, _, _ in chunks:
        real = vb[t0:t1][vb[t0:t1] < meta["n_vblocks"]]
        if len(real):
            vspan = max(vspan, int(real[-1]) - int(real[0]) + 1)
    meta["chunk_vblocks"] = int(vspan)


def bat_plan_from_host(arrays: dict, meta: dict) -> BatPlan:
    return BatPlan(
        out_block=jnp.asarray(arrays["out_block"]),
        vblock=jnp.asarray(arrays["vblock"]),
        dst3=jnp.asarray(arrays["dst3"]),
        dst_km=jnp.asarray(arrays["dst_km"]) if "dst_km" in arrays else None,
        mask_km=None,
        **meta,
    )


def build_bat_plan(dst, num_segments: int, **kwargs) -> BatPlan:
    arrays, meta = build_bat_plan_host(dst, num_segments, **kwargs)
    return bat_plan_from_host(arrays, meta)


def packed_width(n: int) -> int:
    """Smallest divisor of 128 that fits n (packed lane width), or 0 if n
    needs the full-width SR path."""
    for d in (8, 16, 32, 64):
        if n <= d:
            return d
    return 0


def build_segment_plan(
    dst: np.ndarray,
    src: Optional[np.ndarray] = None,
    num_segments: int = 0,
    feature_hint: int = 0,
    **kwargs,
) -> SegmentPlan:
    """Build a SegmentPlan from a dst-sorted COO edge list (host-side).
    `feature_hint` (expected feature width) precomputes the packed-kernel
    k-major arrays for narrow features. See `build_segment_plan_host` for
    the other arguments."""
    arrays, meta = build_segment_plan_host(dst, src, num_segments, **kwargs)
    km_pack = 0
    nw = packed_width(feature_hint) if feature_hint else 0
    if nw:
        km_pack = 128 // nw
    return plan_from_host(arrays, meta, km_pack=km_pack)


# ---------------------------------------------------------------------------
# Bucketed BAT: edges re-sorted by (source bucket, dst) so each chunk's
# gather reads a SLICED sub-table. Measured on v5e: the XLA row gather runs
# ~2-4x faster from a <=170k-row table than from a products-scale (2.45M
# row, 1.25 GB) one, and gather cost grows with TABLE size, not only row
# count — chunked execution over the full table re-pays that cost per
# chunk. Static/baked-weight ops only: per-call weights would need an nnz
# scalar permutation at runtime (~10 ms per 1.2M edges — the round-1
# disaster this layout exists to avoid).
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BucketedBatPlan:
    """BAT tiles over a (src-bucket, dst)-sorted, per-bucket e_tile-padded
    edge list. vblock indexes PADDED value blocks; `src_local` holds
    bucket-local gather ids and `w_pad` the baked weights, both padded with
    one trailing sentinel block (chunk uniformization targets it).

    chunks: ((t0, t1, w0, w1, row_off), ...) — row_off is the bucket's
    first row in the gather table; a chunk never spans two buckets.
    """

    out_block: jax.Array  # [T] int32 — per-bucket non-decreasing
    vblock: jax.Array  # [T] int32 — global padded block ids, non-decr/bucket
    dst3: jax.Array  # [n_vblocks+1, 1, e_tile] int32, -1 padded
    src_local: jax.Array  # [(n_vblocks+1)*e_tile] int32 bucket-local ids
    w_pad: Optional[jax.Array]  # [(n_vblocks+1)*e_tile] f32 or None
    e_tile: int = dataclasses.field(metadata=dict(static=True))
    s_tile: int = dataclasses.field(metadata=dict(static=True))
    num_segments: int = dataclasses.field(metadata=dict(static=True))
    n_blocks: int = dataclasses.field(metadata=dict(static=True))
    num_edges: int = dataclasses.field(metadata=dict(static=True))
    n_vblocks: int = dataclasses.field(metadata=dict(static=True))
    bucket_rows: int = dataclasses.field(metadata=dict(static=True))
    chunks: tuple = dataclasses.field(default=(), metadata=dict(static=True))
    chunk_blocks: int = dataclasses.field(default=0, metadata=dict(static=True))

    @property
    def num_tiles(self) -> int:
        return self.out_block.shape[0]

    @property
    def padded_segments(self) -> int:
        return self.n_blocks * self.s_tile


def build_bucketed_bat_plan(
    gather_idx: np.ndarray,
    reduce_idx: np.ndarray,
    num_segments: int,
    num_gather_rows: int,
    *,
    edge_weight: Optional[np.ndarray] = None,
    e_tile: int = 1024,
    s_tile: int = 256,
    bucket_rows: int = 128 * 1024,
    max_chunk_tiles: int = 2048,
) -> BucketedBatPlan:
    """Host build. `reduce_idx` must be sorted ascending (dst-sorted edge
    list); the builder re-sorts to (bucket(gather_idx), reduce_idx) order
    and bakes `edge_weight` into that order."""
    gi = np.asarray(gather_idx, np.int64)
    ri = np.asarray(reduce_idx, np.int64)
    nnz = len(gi)
    if nnz and int(ri.max()) >= num_segments:
        raise ValueError("reduce_idx out of range")
    bn = int(bucket_rows)
    n_buckets = max(_cdiv(max(num_gather_rows, 1), bn), 1)
    # stable sort by bucket: input is reduce-sorted, so the result is
    # (bucket, reduce) lexicographic
    bucket = (gi // bn).astype(np.int32)
    from geot_tpu import native as _native

    perm = _native.sort_by_key(bucket, n_buckets)
    if perm is None:
        perm = np.argsort(bucket, kind="stable")
    gi, ri, bucket = gi[perm], ri[perm], bucket[perm]
    w = None if edge_weight is None else np.asarray(
        edge_weight, np.float32
    )[perm]

    counts = np.bincount(bucket, minlength=n_buckets).astype(np.int64)
    pad_counts = _cdiv(np.maximum(counts, 0), e_tile) * e_tile
    # buckets with zero edges occupy zero padded blocks
    pstart = np.zeros(n_buckets + 1, np.int64)
    np.cumsum(pad_counts, out=pstart[1:])
    estart = np.zeros(n_buckets + 1, np.int64)
    np.cumsum(counts, out=estart[1:])
    n_pad_rows = int(pstart[-1])
    n_vblocks = max(n_pad_rows // e_tile, 1)

    dst_pad = np.full(n_pad_rows + e_tile, -1, np.int32)  # + sentinel block
    src_pad = np.zeros(n_pad_rows + e_tile, np.int32)
    w_pad = (
        None if w is None else np.zeros(n_pad_rows + e_tile, np.float32)
    )
    obs, vbs = [], []
    chunks = []
    n_blocks = max(_cdiv(max(num_segments, 1), s_tile), 1)
    for k in range(n_buckets):
        e0, e1 = int(estart[k]), int(estart[k + 1])
        if e0 == e1:
            continue
        p0 = int(pstart[k])
        dst_pad[p0 : p0 + (e1 - e0)] = ri[e0:e1]
        src_pad[p0 : p0 + (e1 - e0)] = (gi[e0:e1] - k * bn).astype(np.int32)
        if w_pad is not None:
            w_pad[p0 : p0 + (e1 - e0)] = w[e0:e1]
        nat = _native.build_bat_tiles(
            ri[e0:e1].astype(np.int32), num_segments, e_tile, s_tile
        )
        if nat is not None:
            ob_k, vb_k = nat
        else:
            # numpy fallback mirrors build_bat_plan_host's compaction
            win = ri[e0:e1] // s_tile
            blk = np.arange(e1 - e0, dtype=np.int64) // e_tile
            nv = max(_cdiv(e1 - e0, e_tile), 1)
            key = win * nv + blk
            head = np.empty(e1 - e0, bool)
            head[0] = True
            np.not_equal(key[1:], key[:-1], out=head[1:])
            uniq = key[head]
            ob_k = (uniq // nv).astype(np.int32)
            vb_k = (uniq % nv).astype(np.int32)
            missing = np.setdiff1d(np.arange(n_blocks, np.int32), ob_k)
            if len(missing):
                ob_k = np.concatenate([ob_k, missing])
                vb_k = np.concatenate(
                    [vb_k, np.zeros(len(missing), np.int32)]
                )
                order = np.argsort(ob_k, kind="stable")
                ob_k, vb_k = ob_k[order], vb_k[order]
                vb_k = np.maximum.accumulate(vb_k).astype(np.int32)
        # drop whole-graph coverage tiles outside the bucket's own window
        # span — gap coverage INSIDE the span stays (the scan accumulator
        # must see zeros, not uninitialized rows, for every window in a
        # chunk's [w0, w1) range)
        w_lo = int(ri[e0]) // s_tile
        w_hi = int(ri[e1 - 1]) // s_tile
        keep = (ob_k >= w_lo) & (ob_k <= w_hi)
        ob_k, vb_k = ob_k[keep], vb_k[keep]
        vb_k = vb_k + p0 // e_tile
        base_t = sum(len(o) for o in obs)
        for t0, t1, w0, w1 in (
            compute_chunks(ob_k, max_chunk_tiles)
            or ((0, len(ob_k), int(ob_k[0]), int(ob_k[-1]) + 1),)
        ):
            chunks.append(
                (base_t + t0, base_t + t1, w0, w1, k * bn)
            )
        obs.append(ob_k)
        vbs.append(vb_k)

    ob = np.concatenate(obs) if obs else np.zeros(1, np.int32)
    vb = np.concatenate(vbs) if vbs else np.zeros(1, np.int32)
    if not obs:
        chunks = [(0, 1, 0, 1, 0)]
    # uniformize: every chunk padded to the same (tiles, windows); pad
    # tiles target the sentinel value block and the chunk's last window
    T_max = max(t1 - t0 for t0, t1, _, _, _ in chunks)
    W_max = max(w1 - w0 for _, _, w0, w1, _ in chunks)
    n_c = len(chunks)
    new_ob = np.zeros(n_c * T_max, np.int32)
    new_vb = np.full(n_c * T_max, n_vblocks, np.int32)
    new_chunks = []
    for i, (t0, t1, w0, w1, roff) in enumerate(chunks):
        nt = t1 - t0
        base = i * T_max
        new_ob[base : base + nt] = ob[t0:t1]
        new_vb[base : base + nt] = vb[t0:t1]
        pad_windows = list(range(w1, w0 + W_max))
        pad_ob = (pad_windows + [w0 + W_max - 1] * T_max)[: T_max - nt]
        new_ob[base + nt : base + T_max] = np.asarray(pad_ob, np.int32)
        new_chunks.append((base, base + T_max, int(w0), int(w1), int(roff)))

    dst3 = dst_pad.reshape(-1, 1, e_tile)
    return BucketedBatPlan(
        out_block=jnp.asarray(new_ob),
        vblock=jnp.asarray(new_vb),
        dst3=jnp.asarray(dst3),
        src_local=jnp.asarray(src_pad),
        w_pad=None if w_pad is None else jnp.asarray(w_pad),
        e_tile=int(e_tile),
        s_tile=int(s_tile),
        num_segments=int(num_segments),
        n_blocks=int(n_blocks),
        num_edges=int(nnz),
        n_vblocks=int(n_vblocks),
        bucket_rows=bn,
        chunks=tuple(new_chunks),
        chunk_blocks=int(W_max),
    )
