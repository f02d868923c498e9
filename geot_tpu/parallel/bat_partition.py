"""Per-part scan-chunked BAT plans for multi-chip execution.

The slot-layout per-part plans (`partition.py`) must fit the SMEM
scalar-prefetch budget AND gather every edge's source row in one XLA op —
at products scale (61.9M edges / 8 parts ≈ 7.7M edges/part, N=128) that is
a ~4 GB transient per part and the partition simply refused to build
(round-2 `MAX_PREFETCH_TILES` raise). This module gives the multi-chip
path the same treatment the single-chip path got in round 2: BAT tiles
executed in uniform chunks under `lax.scan`, gathering only one chunk's
edges at a time.

The twist vs the single-chip scan (`ops.api._bat_sum_scan`): `shard_map`
runs ONE program on every part, so anything static must be equal across
parts while each part's chunk *windows* are data. `build_part_bat_family`
therefore equalizes the chunk grid — (C, T_c, W_c, n_vblocks) are padded
to the per-part maxima — and ships the per-chunk window ranges as traced
`[P, C]` arrays consumed through `_bat_sum_scan(chunk_meta=...)`. Pad
tiles target the all--1 sentinel dst block (match nothing, add nothing);
all-pad chunks park their output window in the carry's margin rows.

New-design component (the reference is single-GPU — SURVEY §2.7); the
chunked-gather idea matches the single-chip scan executor, reference
analogue `csrc/cuda/wrapper/*_base.h` grid-capping logic.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from geot_tpu.graph.plan import MAX_PREFETCH_TILES, build_bat_plan_host

__all__ = ["PartBatFamily", "build_part_bat_family", "part_bat_reduce"]


def _cdiv(a, b):
    return -(-a // b)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PartBatFamily:
    """Stacked per-part BAT plans with an equalized chunk grid.

    Array fields carry a leading parts axis P (sharded over the mesh axis
    inside `halo_spmm`; strip with `unbatch`):
      out_block: [P, C*T_c] int32 — output window per tile (absolute).
      vblock:    [P, C*T_c] int32 — value block per tile; n_vblocks = the
                 all--1 sentinel.
      dst3:      [P, n_vblocks+1, 1, E] int32 — dst ids per value block,
                 -1 padded; block n_vblocks is the sentinel.
      src:       [P, n_vblocks*E] int32 — edge-order source row ids into
                 the reduce input (receive buffer or local shard), 0 pad.
      w:         [P, n_vblocks*E] float32 or None — edge weights, 0 pad.
      chunk_w0 / chunk_w1: [P, C] int32 — per-chunk output window ranges
                 (the data that varies per part; W_c, C, T_c do not).
    """

    out_block: jax.Array
    vblock: jax.Array
    dst3: jax.Array
    src: jax.Array
    w: Optional[jax.Array]
    chunk_w0: jax.Array
    chunk_w1: jax.Array
    e_tile: int = dataclasses.field(metadata=dict(static=True))
    s_tile: int = dataclasses.field(metadata=dict(static=True))
    num_segments: int = dataclasses.field(metadata=dict(static=True))
    n_blocks: int = dataclasses.field(metadata=dict(static=True))
    n_vblocks: int = dataclasses.field(metadata=dict(static=True))
    C: int = dataclasses.field(metadata=dict(static=True))
    T_c: int = dataclasses.field(metadata=dict(static=True))
    W_c: int = dataclasses.field(metadata=dict(static=True))

    def unbatch(self) -> "PartBatFamily":
        """Strip the leading parts axis (size 1 inside shard_map)."""
        return dataclasses.replace(
            self,
            out_block=self.out_block[0],
            vblock=self.vblock[0],
            dst3=self.dst3[0],
            src=self.src[0],
            w=None if self.w is None else self.w[0],
            chunk_w0=self.chunk_w0[0],
            chunk_w1=self.chunk_w1[0],
        )


def build_part_bat_family(
    dst_parts: List[np.ndarray],
    src_parts: List[np.ndarray],
    w_parts: List[Optional[np.ndarray]],
    num_segments: int,
    *,
    e_tile: int = 1024,
    s_tile: int = 256,
    max_chunk_tiles: int = MAX_PREFETCH_TILES,
) -> PartBatFamily:
    """Build one edge family's stacked plans. `dst_parts[p]` must be
    sorted ascending (each part's local dst ids); `src_parts[p]` are the
    matching source row ids in the same edge order."""
    P = len(dst_parts)
    pieces = []
    for p in range(P):
        d = np.asarray(dst_parts[p], np.int64)
        arrays, meta = build_bat_plan_host(
            d, num_segments, e_tile=e_tile, s_tile=s_tile,
            max_chunk_tiles=max_chunk_tiles,
        )
        if not meta["chunks"]:
            # whole plan as one chunk so every part runs the scan executor
            T = int(len(arrays["out_block"]))
            meta["chunks"] = ((0, T, 0, int(meta["n_blocks"])),)
            meta["chunk_blocks"] = int(meta["n_blocks"])
        pieces.append((arrays, meta))

    n_blocks = pieces[0][1]["n_blocks"]
    nvb_max = max(m["n_vblocks"] for _, m in pieces)
    C = max(len(m["chunks"]) for _, m in pieces)
    T_c = max(m["chunks"][0][1] - m["chunks"][0][0] for _, m in pieces)
    W_c = max(m["chunk_blocks"] for _, m in pieces)
    E = int(e_tile)

    obs, vbs, d3s, srcs, ws, w0s, w1s = [], [], [], [], [], [], []
    weighted = any(w is not None for w in w_parts)
    for p, (arrays, meta) in enumerate(pieces):
        nvb_p = meta["n_vblocks"]
        chunks = meta["chunks"]
        ob = np.asarray(arrays["out_block"], np.int32)
        # per-part sentinel (nvb_p) -> shared sentinel (nvb_max)
        vb = np.asarray(arrays["vblock"], np.int32)
        vb = np.where(vb >= nvb_p, nvb_max, vb).astype(np.int32)
        T_p = chunks[0][1] - chunks[0][0]
        ob_new = np.full((C, T_c), np.int32(n_blocks))
        vb_new = np.full((C, T_c), np.int32(nvb_max))
        cw0 = np.full(C, np.int32(n_blocks))
        cw1 = np.full(C, np.int32(n_blocks))
        for i, (t0, t1, w0, w1) in enumerate(chunks):
            ob_new[i, :T_p] = ob[t0:t1]
            vb_new[i, :T_p] = vb[t0:t1]
            # extension pads repeat the chunk's LAST tile window (keeps
            # out_block non-decreasing past the in-part pad windows) with
            # the sentinel value block — they add nothing
            ob_new[i, T_p:] = ob[t1 - 1]
            cw0[i], cw1[i] = w0, w1
        obs.append(ob_new.reshape(-1))
        vbs.append(vb_new.reshape(-1))
        w0s.append(cw0)
        w1s.append(cw1)

        d3 = np.full((nvb_max + 1, 1, E), -1, np.int32)
        d3[:nvb_p] = np.asarray(arrays["dst3"], np.int32)[:nvb_p]
        d3s.append(d3)

        s_arr = np.zeros(nvb_max * E, np.int32)
        s_arr[: len(src_parts[p])] = np.asarray(src_parts[p], np.int32)
        srcs.append(s_arr)
        if weighted:
            w_arr = np.zeros(nvb_max * E, np.float32)
            wp = w_parts[p]
            if wp is not None and len(wp):
                w_arr[: len(wp)] = np.asarray(wp, np.float32)
            ws.append(w_arr)

    return PartBatFamily(
        out_block=jnp.asarray(np.stack(obs)),
        vblock=jnp.asarray(np.stack(vbs)),
        dst3=jnp.asarray(np.stack(d3s)),
        src=jnp.asarray(np.stack(srcs)),
        w=jnp.asarray(np.stack(ws)) if weighted else None,
        chunk_w0=jnp.asarray(np.stack(w0s)),
        chunk_w1=jnp.asarray(np.stack(w1s)),
        e_tile=E,
        s_tile=int(s_tile),
        num_segments=int(num_segments),
        n_blocks=int(n_blocks),
        n_vblocks=int(nvb_max),
        C=int(C),
        T_c=int(T_c),
        W_c=int(W_c),
    )


def part_bat_reduce(
    fam: PartBatFamily, xr: jax.Array, use_pallas: bool = True
) -> jax.Array:
    """Part-local segment sum: out[d] += w_e * xr[src_e] over the family's
    edges, scan-chunked (each chunk gathers only its own nblk*E rows).
    `fam` must be unbatched (no parts axis). Returns [num_segments, F]."""
    if not use_pallas:
        dst = fam.dst3[: fam.n_vblocks].reshape(-1)
        vals = xr[fam.src]
        if fam.w is not None:
            vals = vals * fam.w[:, None]
        vals = jnp.where((dst >= 0)[:, None], vals, 0)
        return (
            jnp.zeros((fam.num_segments, xr.shape[1]), jnp.float32)
            .at[jnp.maximum(dst, 0)]
            .add(vals.astype(jnp.float32))
            .astype(xr.dtype)
        )

    from geot_tpu.graph.plan import BatPlan
    from geot_tpu.ops.api import _bat_sum_scan

    bp = BatPlan(
        out_block=fam.out_block,
        vblock=fam.vblock,
        dst3=fam.dst3,
        dst_km=None,
        mask_km=None,
        e_tile=fam.e_tile,
        s_tile=fam.s_tile,
        num_segments=fam.num_segments,
        n_blocks=fam.n_blocks,
        num_edges=fam.n_vblocks * fam.e_tile,
        n_vblocks=fam.n_vblocks,
    )
    E = fam.e_tile
    nblk = fam.T_c + 1
    # +512: the scan executor may request a fast-emitter gather size (an
    # odd multiple of 512 — see api._bat_sum_scan); the slice must never
    # clamp its start on the last chunk
    src_pad = jnp.pad(fam.src, (0, nblk * E + 512))

    def vals_fn(vb0, size, _token):
        idx = jax.lax.dynamic_slice_in_dim(src_pad, vb0 * E, size)
        return xr[idx]

    return _bat_sum_scan(
        bp,
        vals_fn,
        xr.shape[1],
        fam.w,
        chunk_meta=(fam.C, fam.T_c, fam.W_c, fam.chunk_w0, fam.chunk_w1),
    )
