"""Per-part streaming (gather-free) plans for multi-chip interior edges.

VERDICT r4 Next #5: the hybrid stream path — the best single-chip path on
community-structured graphs — composes with the multi-chip layer here.
Interior edges of a clustered partition are exactly the dense (dst-window,
src-block) cells the streaming kernel wins on: their sources live in the
part's own feature shard, so each part can run `stream_segment_acc` on its
local x block with no communication. The interior *residue* (sparse cells)
stays on the scan-chunked BAT family (`parallel.bat_partition`); boundary
edges always ride BAT — their sources arrive via the halo receive buffer,
whose positions have no block locality by construction.

shard_map runs ONE program on every part, so the per-part stream plans are
equalized: a single forced tile size E, tile counts padded to the per-part
maximum, and a uniform (C, T_c) chunk grid. Pad tiles carry all--1 slots
(match nothing, add nothing) and repeat the last real window, so the
aliased accumulate is a no-op on them — the same trick as
`PartBatFamily`'s sentinel blocks.

New-design component (the reference is single-GPU, SURVEY §2.7); the
output-stationary idea matches `csrc/cuda/csr_gws_kernel.cuh:12-187`
(stage close to compute), applied per part.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from geot_tpu.graph.plan import MAX_PREFETCH_TILES
from geot_tpu.graph.stream_plan import build_stream_split_host

__all__ = [
    "PartStreamFamily",
    "build_part_stream_family",
    "part_stream_reduce",
]


def _cdiv(a, b):
    return -(-a // b)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PartStreamFamily:
    """Stacked per-part stream plans (ONE tile size), equalized shapes.

    Array fields carry a leading parts axis P (strip with `unbatch`):
      ob:    [P, C*T_c] int32 — output window per tile (part-local,
             non-decreasing within each chunk; pad tiles repeat the last
             real window).
      sb:    [P, C*T_c] int32 — x block streamed by tile t.
      dst3:  [P, C*T_c, 1, E] int32 — part-local dst ids, -1 pads.
      srcl3: [P, C*T_c, 1, E] int32 — block-local src ids, -1 pads.
      w3:    [P, C*T_c, 1, E] float32 or None — static slot weights.
    """

    ob: jax.Array
    sb: jax.Array
    dst3: jax.Array
    srcl3: jax.Array
    w3: Optional[jax.Array]
    e_tile: int = dataclasses.field(metadata=dict(static=True))
    s_tile: int = dataclasses.field(metadata=dict(static=True))
    x_rows: int = dataclasses.field(metadata=dict(static=True))
    num_segments: int = dataclasses.field(metadata=dict(static=True))
    n_blocks: int = dataclasses.field(metadata=dict(static=True))
    n_xblocks: int = dataclasses.field(metadata=dict(static=True))
    C: int = dataclasses.field(metadata=dict(static=True))
    T_c: int = dataclasses.field(metadata=dict(static=True))

    def unbatch(self) -> "PartStreamFamily":
        return dataclasses.replace(
            self,
            ob=self.ob[0],
            sb=self.sb[0],
            dst3=self.dst3[0],
            srcl3=self.srcl3[0],
            w3=None if self.w3 is None else self.w3[0],
        )


def build_part_stream_family(
    dst_parts: List[np.ndarray],
    src_parts: List[np.ndarray],
    w_parts: List[Optional[np.ndarray]],
    num_segments: int,
    num_src: int,
    *,
    e_tile: int = 1024,
    s_tile: int = 256,
    x_rows: int = 256,
    feature_hint: int = 128,
    min_stream_frac: float = 0.0,
    margin: Optional[float] = None,
) -> Tuple[Optional[PartStreamFamily], List[np.ndarray], dict]:
    """Split each part's (dst-sorted, part-local) interior edges into a
    streamed family + residue.

    Returns (family, rest_masks, stats): `family` is None when NO part's
    census accepts streaming (callers then keep everything on BAT);
    `rest_masks[p]` marks part p's residue edges (all-True when that part
    does not stream). A part whose census rejects simply contributes zero
    tiles — its edges all land in the residue.
    """
    P = len(dst_parts)
    weighted = any(w is not None and len(w) for w in w_parts)
    per_part = []
    rest_masks = []
    stats: dict = {"parts": []}
    for p in range(P):
        d_p = np.asarray(dst_parts[p], np.int64)
        s_p = np.asarray(src_parts[p], np.int64)
        w_p = w_parts[p]
        if len(d_p) == 0:
            per_part.append(None)
            rest_masks.append(np.zeros(0, bool))
            stats["parts"].append({"stream_frac": 0.0})
            continue
        families, rest_mask, st = build_stream_split_host(
            d_p, s_p, num_segments, num_src,
            s_tile=s_tile, x_rows=x_rows,
            e_tile=e_tile,  # force ONE family — shard_map needs one shape
            edge_weight=w_p if weighted else None,
            feature_hint=feature_hint,
            min_stream_frac=min_stream_frac,
            margin=margin,
        )
        if families is None or len(families) == 0:
            per_part.append(None)
        else:
            assert len(families) == 1, "forced e_tile must yield one family"
            per_part.append(families[0])
        rest_masks.append(rest_mask)
        stats["parts"].append(
            {k: st.get(k) for k in ("stream_frac", "est_stream_ms")}
        )
    if all(f is None for f in per_part):
        return None, rest_masks, stats

    n_blocks = max(_cdiv(max(num_segments, 1), s_tile), 1)
    n_xb = max(_cdiv(max(num_src, 1), x_rows), 1)
    E = int(e_tile)
    # equalized chunk grid across parts
    C = 1
    T_c = 1
    for fam in per_part:
        if fam is None:
            continue
        arrays, meta = fam
        chunks = meta["chunks"] or ((0, len(arrays["out_block"]), 0, 0),)
        C = max(C, len(chunks))
        T_c = max(T_c, max(t1 - t0 for t0, t1, _, _ in chunks))

    obs, sbs, d3s, sl3s, w3s = [], [], [], [], []
    for fam in per_part:
        ob_new = np.zeros((C, T_c), np.int32)
        sb_new = np.zeros((C, T_c), np.int32)
        d3_new = np.full((C, T_c, 1, E), -1, np.int32)
        sl_new = np.full((C, T_c, 1, E), -1, np.int32)
        w3_new = np.zeros((C, T_c, 1, E), np.float32) if weighted else None
        if fam is not None:
            arrays, meta = fam
            ob = np.asarray(arrays["out_block"], np.int32)
            sb = np.asarray(arrays["sblock"], np.int32)
            d3 = np.asarray(arrays["dst3"], np.int32)
            sl3 = np.asarray(arrays["srcl3"], np.int32)
            w3 = np.asarray(arrays["w3"], np.float32) if weighted and "w3" in arrays else None
            chunks = meta["chunks"] or ((0, len(ob), 0, 0),)
            for i, (t0, t1, _w0, _w1) in enumerate(chunks):
                nt = t1 - t0
                ob_new[i, :nt] = ob[t0:t1]
                sb_new[i, :nt] = sb[t0:t1]
                d3_new[i, :nt] = d3[t0:t1]
                sl_new[i, :nt] = sl3[t0:t1]
                if w3 is not None:
                    w3_new[i, :nt] = w3[t0:t1]
                # pad tiles repeat the last real (window, x block): all--1
                # slots add nothing and no extra x-block DMA is forced
                if nt:
                    ob_new[i, nt:] = ob[t1 - 1]
                    sb_new[i, nt:] = sb[t1 - 1]
        obs.append(ob_new.reshape(-1))
        sbs.append(sb_new.reshape(-1))
        d3s.append(d3_new.reshape(C * T_c, 1, E))
        sl3s.append(sl_new.reshape(C * T_c, 1, E))
        if weighted:
            w3s.append(w3_new.reshape(C * T_c, 1, E))

    fam_out = PartStreamFamily(
        ob=jnp.asarray(np.stack(obs)),
        sb=jnp.asarray(np.stack(sbs)),
        dst3=jnp.asarray(np.stack(d3s)),
        srcl3=jnp.asarray(np.stack(sl3s)),
        w3=jnp.asarray(np.stack(w3s)) if weighted else None,
        e_tile=E,
        s_tile=int(s_tile),
        x_rows=int(x_rows),
        num_segments=int(num_segments),
        n_blocks=int(n_blocks),
        n_xblocks=int(n_xb),
        C=int(C),
        T_c=int(T_c),
    )
    stats["C"], stats["T_c"] = int(C), int(T_c)
    return fam_out, rest_masks, stats


def part_stream_reduce(fam: PartStreamFamily, x_local: jax.Array) -> jax.Array:
    """Part-local streamed segment sum over one part's family (unbatched):
    out[d] += w_e * x_local[src_e] for the streamed interior edges.
    Returns [num_segments, F] (f32 accumulation, x dtype out)."""
    from geot_tpu.ops.api import _pick_f_tile, _round_up
    from geot_tpu.ops.pallas_segment import stream_segment_acc

    n = x_local.shape[1]
    f_tile = _pick_f_tile(n)
    f_pad = _round_up(max(n, 1), f_tile)
    rows_pad = fam.n_xblocks * fam.x_rows
    if f_pad != n or rows_pad != x_local.shape[0]:
        x_local = jnp.pad(
            x_local,
            ((0, rows_pad - x_local.shape[0]), (0, f_pad - n)),
        )
    carry = jnp.zeros((fam.n_blocks * fam.s_tile, f_pad), jnp.float32)
    if fam.C == 1:
        carry = stream_segment_acc(
            fam.ob, fam.sb, fam.dst3, fam.srcl3, x_local, carry, fam.w3,
            s_tile=fam.s_tile, x_rows=fam.x_rows, f_tile=f_tile,
        )
    else:
        ob2 = fam.ob.reshape(fam.C, fam.T_c)
        sb2 = fam.sb.reshape(fam.C, fam.T_c)
        dst2 = fam.dst3.reshape(fam.C, fam.T_c, 1, fam.e_tile)
        sl2 = fam.srcl3.reshape(fam.C, fam.T_c, 1, fam.e_tile)
        w2 = (
            None
            if fam.w3 is None
            else fam.w3.reshape(fam.C, fam.T_c, 1, fam.e_tile)
        )

        def body(carry, xs):
            if w2 is None:
                ob_i, sb_i, d_i, sl_i = xs
                w_i = None
            else:
                ob_i, sb_i, d_i, sl_i, w_i = xs
            carry = stream_segment_acc(
                ob_i, sb_i, d_i, sl_i, x_local, carry, w_i,
                s_tile=fam.s_tile, x_rows=fam.x_rows, f_tile=f_tile,
            )
            return carry, None

        xs = (ob2, sb2, dst2, sl2)
        if w2 is not None:
            xs = xs + (w2,)
        carry, _ = jax.lax.scan(body, carry, xs)
    return carry[: fam.num_segments, :n].astype(x_local.dtype)
