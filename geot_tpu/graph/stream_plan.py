"""Output-stationary streaming SpMM plan (gather-free path).

The round-2 dissection established that XLA's random row gather is
issue-bound (~3.1 ns/row from small tables, ~12 ns/row in context from a
products-scale 1.25 GB table) and caps every gather-based SpMM at
0.04-0.16 of the HBM roofline. This module implements the architecture
that escapes that floor — the TPU dual of the reference's rowcaching
`csr_gws` kernel (`/root/reference/csrc/cuda/csr_gws_kernel.cuh:12-187`,
which stages nnz values in shared memory close to compute):

  * edges are re-sorted by (dst window, src block) **cells**
    (window = ``s_tile`` output rows, block = ``x_rows`` rows of x);
  * each tile holds ``e_tile`` edge slots of ONE cell;
  * the Pallas kernel keeps the dst-window accumulator in VMEM (the
    existing flush-once machinery), pulls tile t's x block via a
    scalar-prefetch-driven BlockSpec (a sequential block DMA, never a row
    gather), and selects the edge's source rows with a src one-hot matmul
    on the MXU.

Round-4 dissection (scratch_r4/{dissect,overhead,packed,shapes_base}.log,
TPU v5e, f32, S=W=256) refined the cost model and the plan shape:

  * per-tile cost = FIXED + e_tile * MARG with FIXED ~= 0.95 us (grid-step
    overhead ~0.68 us + x-block DMA ~0.27 us; NOT DMA-descriptor count —
    packing dst/srcl/w into one operand changed nothing) and MARG ~= 1.95
    ns/slot (one-hot construction + 4 bf16 MXU passes);
  * so ns/slot falls with e_tile: 5.34 (E=256), 3.87 (512), 2.77 (1024),
    2.37 (2048), 2.15 (4096) at full fill — tiles should be as large as
    the cell allows. The builder now assigns the cost-optimal e_tile PER
    CELL and emits one plan family per tile size (hub cells get 2048/4096
    tiles, modest cells 256/512); families add into one output.
  * alternatives measured and rejected: in-kernel tpu.dynamic_gather
    select (take_along_axis lane gathers, scratch_r4/probe_taket.py) runs
    4.6-8.9 ns/slot — SLOWER than the one-hot MXU select; (S,W) other
    than (256,256) all measured worse (scratch_r4/shapes_base.log).

Cells below the streamed-cost crossover keep the BAT+gather path; the two
partial results add (`HybridPlan`). On a uniform-random graph everything
lands in the remainder and behavior degenerates to the round-2 BAT path;
on community-structured graphs (real ogbn-products/reddit — see
`synthetic_clustered_graph`) most edges stream. The decision comes from a
host-side cell census — the measurable locality statistic the dispatch
keys on.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from geot_tpu.graph.plan import MAX_PREFETCH_TILES, compute_chunks

__all__ = [
    "StreamPlan",
    "HybridPlan",
    "build_stream_split_host",
    "stream_plan_from_host",
    "cell_census",
    "E_CHOICES",
    "FIXED_NS",
    "MARG_NS",
]

# Measured stream-kernel PER-TILE costs (TPU v5e, f32, S=W=256).
# Production families at products-clustered (r4 hybrid_parts2 + r5
# synthetic probes, scratch_r5/rest4b.log): the cost is NOT affine in E —
# window-sparse families pay an aliased carry read-modify-write per window
# run and big tiles amortize grid overhead differently — so the model is
# a measured lookup per tile size, not FIXED + E*MARG. Values are
# production-biased (products-scale tables); at small tables tiles run
# slightly cheaper, which only under-selects streaming in the
# margin-gated small-graph regime.
TILE_NS = {256: 950.0, 512: 1500.0, 1024: 3400.0, 2048: 6400.0, 4096: 9100.0}
# Affine fallback for tile sizes outside the measured table.
FIXED_NS = float(os.environ.get("GEOT_STREAM_FIXED_NS", "650.0"))
MARG_NS = float(os.environ.get("GEOT_STREAM_MARG_NS", "2.1"))
E_CHOICES = (256, 512, 1024, 2048, 4096)


def _tile_ns(E: int) -> float:
    env = os.environ.get(f"GEOT_STREAM_TILE_NS_{E}")
    if env:
        return float(env)
    return TILE_NS.get(E, FIXED_NS + E * MARG_NS)


def _cdiv(a, b):
    return -(-a // b)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StreamPlan:
    """Cell-sorted streaming execution plan (ONE tile-size family).

    Array fields (T tiles, E = e_tile):
      out_block: [T] int32 — output window per tile, non-decreasing.
      sblock:    [T] int32 — x block streamed for tile t (block b covers x
        rows [b*x_rows, (b+1)*x_rows)).
      dst3:      [T, 1, E] int32 — global dst ids, -1 on padding slots.
      srcl3:     [T, 1, E] int32 — block-local src ids (src - sblock*x_rows),
        -1 on padding (matches no one-hot row -> contributes nothing).
      w3:        [T, 1, E] float32 or None — static per-slot weights (0 pad).
      edge_pos:  [T, 1, E] int32 or None — slot -> index into the caller's
        dst-sorted edge arrays (0 on padding; pads contribute nothing via
        srcl3 = -1), for routing dynamic per-call weights.

    Execution accumulates straight into a shared carry via the aliased
    kernel (`stream_segment_acc`): windows a family never visits are never
    touched, so there are no coverage tiles and no visited masks.
    """

    out_block: jax.Array
    sblock: jax.Array
    dst3: jax.Array
    srcl3: jax.Array
    w3: Optional[jax.Array]
    edge_pos: Optional[jax.Array]
    e_tile: int = dataclasses.field(metadata=dict(static=True))
    s_tile: int = dataclasses.field(metadata=dict(static=True))
    x_rows: int = dataclasses.field(metadata=dict(static=True))
    num_segments: int = dataclasses.field(metadata=dict(static=True))
    n_blocks: int = dataclasses.field(metadata=dict(static=True))
    n_xblocks: int = dataclasses.field(metadata=dict(static=True))
    num_edges: int = dataclasses.field(metadata=dict(static=True))
    chunks: tuple = dataclasses.field(default=(), metadata=dict(static=True))
    chunk_blocks: int = dataclasses.field(default=0, metadata=dict(static=True))

    @property
    def num_tiles(self) -> int:
        return self.out_block.shape[0]

    @property
    def padded_segments(self) -> int:
        return self.n_blocks * self.s_tile


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HybridPlan:
    """Streamed dense cells + gather remainder (see module docstring).

    stream: tuple of StreamPlans (one per tile-size family; partial sums
            add into one output).
    rest:   BatPlan over the remaining (dst-sorted) edges, or None when
            every edge streams.
    rest_src: [nnz_rest] int32 gather indices for the remainder.
    rest_w:   [nnz_rest] float32 static weights for the remainder, or None.
    """

    stream: tuple
    rest: Optional[object]  # BatPlan
    rest_src: Optional[jax.Array]
    rest_w: Optional[jax.Array]


def cell_census(
    dst: np.ndarray,
    src: np.ndarray,
    *,
    s_tile: int = 256,
    x_rows: int = 256,
) -> dict:
    """Histogram of (dst window, src block) cell sizes — the dispatch
    statistic for the streaming path (and the successor of
    `graph.block_format.block_stats` as the locality measure with an
    execution-path consumer)."""
    w = np.asarray(dst, np.int64) // s_tile
    b = np.asarray(src, np.int64) // x_rows
    key = w << 32 | b
    _, cnt = np.unique(key, return_counts=True)
    out = dict(
        n_cells=int(len(cnt)),
        mean=float(cnt.mean()) if len(cnt) else 0.0,
        median=float(np.median(cnt)) if len(cnt) else 0.0,
    )
    for tau in (64, 128, 256, 512):
        out[f"frac_ge_{tau}"] = (
            float(cnt[cnt >= tau].sum()) / max(len(dst), 1)
        )
    return out


def _cell_stream_cost(cnt: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-cell streamed cost (ns) and the cost-optimal e_tile: the best
    over E_CHOICES of ceil(cnt/E) * tile_ns(E) (measured per-E costs)."""
    best_cost = np.full(len(cnt), np.inf, np.float64)
    best_e = np.zeros(len(cnt), np.int32)
    for E in E_CHOICES:
        cost = _cdiv(cnt, E).astype(np.float64) * _tile_ns(E)
        sel = cost < best_cost
        best_cost[sel] = cost[sel]
        best_e[sel] = E
    return best_cost, best_e


def build_stream_split_host(
    dst: np.ndarray,
    src: np.ndarray,
    num_segments: int,
    num_src: int,
    *,
    s_tile: int = 256,
    x_rows: int = 256,
    e_tile: int = 0,  # 0 = per-cell cost-optimal; >0 forces one family
    gather_ns: float = 0.0,  # 0 = estimate from table size (stats only)
    feature_hint: int = 128,
    edge_weight: Optional[np.ndarray] = None,
    min_stream_frac: float = 0.25,
    max_chunk_tiles: int = MAX_PREFETCH_TILES,
    build_edge_pos: bool = False,
    margin: Optional[float] = None,
    margin_min_edges: Optional[int] = None,
) -> Tuple[Optional[list], np.ndarray, dict]:
    """Split a dst-sorted edge list into (stream families, gather rest).

    Returns (families, rest_mask, stats): `families` is a list of
    (arrays, meta) pairs — one per tile-size family — each feeding
    `stream_plan_from_host` (None if streaming isn't worth it for this
    graph); `rest_mask` is a bool[nnz] marking edges routed to the gather
    (BAT) path — order-preserving, so the masked sub-list stays dst-sorted.

    Cost model (measured END-TO-END, see module docstring): a cell of cnt
    edges streamed with tile size E costs ceil(cnt/E)*(FIXED_NS +
    E*MARG_NS); on the BAT path it costs cnt*bat_edge_ns, where
    bat_edge_ns interpolates between two measured end-to-end points
    (arxiv N=128: 5.25 ms / 1.17M edges = 4.5 ns/edge at an 87 MB table;
    products N=128: 867 ms / 61.9M edges = 14.0 ns/edge at 1.25 GB).
    Cells stream (with their per-cell optimal E) when cheaper streamed.

    `margin` (default env GEOT_STREAM_MARGIN or 0.75) requires the modeled
    hybrid time to beat `margin * est_all_bat_ms` before the split is
    accepted; the gate only applies at `margin_min_edges`+ edges (default
    env GEOT_STREAM_MARGIN_MIN_EDGES or 200_000) — the scale band where a
    marginal modeled win was measured to flip into a real loss (uniform
    arxiv). Below it, a plain modeled win accepts the split.
    """
    dst = np.asarray(dst, np.int64)
    src = np.asarray(src, np.int64)
    nnz = len(dst)
    n_blocks = max(_cdiv(max(num_segments, 1), s_tile), 1)
    n_xb = max(_cdiv(max(num_src, 1), x_rows), 1)
    stats: dict = {}
    if nnz == 0:
        return None, np.zeros(0, bool), stats

    table_bytes = num_src * max(feature_hint or 128, 1) * 4
    if gather_ns <= 0:
        # measured: ~3.5 ns/row small tables -> ~12 ns/row at 1.25 GB.
        # Reported in stats only — the cost model is calibrated on
        # end-to-end points, not on this component.
        gather_ns = float(np.interp(table_bytes, [128e6, 1.25e9], [3.5, 12.0]))
    # post gather-fix (round-5: span-sized fast-emitter gathers) measured
    # end-to-end points: arxiv N=128 ~4.5 ns/edge (87 MB table), products
    # residue 7.83 ns/edge / whole-graph ~8.5 (1.25 GB table)
    bat_edge_ns = float(
        np.interp(table_bytes, [87e6, 1.25e9], [4.5, 8.5])
    )

    w = dst // s_tile
    b = src // x_rows
    key = w * n_xb + b
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    head = np.empty(nnz, bool)
    head[0] = True
    np.not_equal(key_s[1:], key_s[:-1], out=head[1:])
    cell_start = np.nonzero(head)[0]
    cell_cnt = np.diff(np.concatenate([cell_start, [nnz]]))

    if e_tile:
        tiles = _cdiv(cell_cnt, e_tile)
        stream_cost = tiles.astype(np.float64) * _tile_ns(e_tile)
        cell_e = np.full(len(cell_cnt), e_tile, np.int32)
    else:
        stream_cost, cell_e = _cell_stream_cost(cell_cnt)
    # the REST path rate, measured directly on the products-clustered
    # residue post gather-fix (scratch_r5/rest9.log: 146 ms / 18.66M =
    # 7.83 ns/edge); small tables from the arxiv-scale BAT point +20%
    # residue sparsity premium
    rest_edge_ns = float(np.interp(table_bytes, [87e6, 1.25e9], [5.4, 7.9]))
    sel_cells = stream_cost < cell_cnt * rest_edge_ns
    streamed = int(cell_cnt[sel_cells].sum())
    stream_frac = streamed / nnz
    est_stream_ms = float(stream_cost[sel_cells].sum()) / 1e6
    # the rest runs at the residue premium (the same rate the per-cell
    # selection uses) — using plain bat_edge_ns here understated the rest
    # cost feeding the margin gate (ADVICE r4)
    est_bat_ms = (nnz - streamed) * rest_edge_ns / 1e6
    stats.update(
        stream_frac=stream_frac,
        n_cells=len(cell_cnt), n_stream_cells=int(sel_cells.sum()),
        gather_ns=gather_ns,
        est_stream_ms=est_stream_ms,
        est_bat_ms=est_bat_ms,
        est_all_bat_ms=nnz * bat_edge_ns / 1e6,
    )
    # At scale, accept the split only with a clear modeled margin. The
    # per-edge constants are calibrated at products scale; at mid scale
    # they are unreliable in BOTH directions (measured: the XLA gather is
    # non-monotonic in table size — 3.5 ns/row at 87 MB, 12.5 at 300 MB,
    # 5.9 at 1.25 GB, scratch_r2/gather_scaling.log). A marginal modeled
    # win (e.g. uniform arxiv: est 8.1 vs 9.9 ms, measured hybrid 11.0 vs
    # 5.25 ms pure-BAT) flips into a 2x loss, so at >= margin_min_edges
    # edges cells stream only when the model predicts a >= (1 - margin)
    # saving. Small graphs (the regime below the measured flip, incl. the
    # unit-test fixtures) accept on a plain modeled win.
    est_hybrid_ms = est_stream_ms + est_bat_ms
    if margin is None:
        margin = float(os.environ.get("GEOT_STREAM_MARGIN", "0.75"))
    if margin_min_edges is None:
        margin_min_edges = int(
            os.environ.get("GEOT_STREAM_MARGIN_MIN_EDGES", "200000")
        )
    eff_margin = margin if nnz >= margin_min_edges else 1.0
    stats["est_hybrid_ms"] = est_hybrid_ms
    stats["margin"] = eff_margin
    if (
        stream_frac < min_stream_frac
        or est_hybrid_ms > eff_margin * stats["est_all_bat_ms"]
    ):
        return None, np.ones(nnz, bool), stats

    # membership of each (sorted) edge: does its cell stream?
    edge_sel_sorted = np.repeat(sel_cells, cell_cnt)
    rest_mask = np.ones(nnz, bool)
    rest_mask[order[edge_sel_sorted]] = False

    families = []
    fam_stats = []
    w_sorted = None
    if edge_weight is not None:
        w_sorted = np.asarray(edge_weight, np.float32)
    for E in sorted(set(cell_e[sel_cells].tolist())):
        fam_cells = sel_cells & (cell_e == E)
        # cell-sorted positions of this family's edges
        edge_in_fam = np.repeat(fam_cells, cell_cnt)
        f_order = order[edge_in_fam]
        f_dst = dst[f_order]
        f_src = src[f_order]
        f_cnt = cell_cnt[fam_cells]
        f_start = np.zeros(len(f_cnt) + 1, np.int64)
        np.cumsum(f_cnt, out=f_start[1:])
        n_fe = int(f_start[-1])
        f_keys = key_s[cell_start[fam_cells]]
        cell_w = (f_keys // n_xb).astype(np.int32)
        cell_b = (f_keys % n_xb).astype(np.int32)
        tiles_per_cell = _cdiv(f_cnt, E)
        T = int(tiles_per_cell.sum())
        ob = np.repeat(cell_w, tiles_per_cell)
        sb = np.repeat(cell_b, tiles_per_cell)
        tile_of_cell = np.zeros(len(f_cnt) + 1, np.int64)
        np.cumsum(tiles_per_cell, out=tile_of_cell[1:])
        pos_in_cell = np.arange(n_fe) - np.repeat(f_start[:-1], f_cnt)
        tile_idx = np.repeat(tile_of_cell[:-1], f_cnt) + pos_in_cell // E
        slot = tile_idx * E + pos_in_cell % E
        dst_slots = np.full(T * E, -1, np.int32)
        srcl = np.full(T * E, -1, np.int32)
        dst_slots[slot] = f_dst
        srcl[slot] = (f_src % x_rows).astype(np.int32)
        w3 = None
        if w_sorted is not None:
            w3 = np.zeros(T * E, np.float32)
            w3[slot] = w_sorted[f_order]
        edge_pos = None
        if build_edge_pos:
            edge_pos = np.zeros(T * E, np.int32)
            edge_pos[slot] = f_order.astype(np.int32)

        arrays = dict(
            out_block=ob.astype(np.int32),
            sblock=sb.astype(np.int32),
            dst3=dst_slots.reshape(T, 1, E),
            srcl3=srcl.reshape(T, 1, E),
        )
        if w3 is not None:
            arrays["w3"] = w3.reshape(T, 1, E)
        if edge_pos is not None:
            arrays["edge_pos"] = edge_pos.reshape(T, 1, E)
        # per-chunk SLOT budget: max_chunk_tiles is calibrated for
        # E=512-ish tiles; scale so tiles*E stays bounded
        mct = max(min(max_chunk_tiles, (max_chunk_tiles * 512) // E), 1)
        meta = dict(
            e_tile=int(E),
            s_tile=int(s_tile),
            x_rows=int(x_rows),
            num_segments=int(num_segments),
            n_blocks=int(n_blocks),
            n_xblocks=int(n_xb),
            num_edges=int(n_fe),
            chunks=compute_chunks(arrays["out_block"], mct),
            chunk_blocks=0,
        )
        _uniformize_stream_chunks(arrays, meta)
        families.append((arrays, meta))
        fam_stats.append(
            dict(e_tile=int(E), n_tiles=int(arrays["out_block"].shape[0]),
                 edges=n_fe,
                 fill=n_fe / max(arrays["out_block"].shape[0] * E, 1))
        )
    stats["families"] = fam_stats
    stats["n_tiles"] = int(sum(f["n_tiles"] for f in fam_stats))
    stats["fill"] = streamed / max(
        sum(f["n_tiles"] * f["e_tile"] for f in fam_stats), 1
    )
    return families, rest_mask, stats


def _uniformize_stream_chunks(arrays: dict, meta: dict) -> None:
    """Pad every chunk to identical tile counts so the scan executor
    compiles ONE chunk body (cf. `plan._uniformize_bat_chunks`). Pad tiles
    carry all--1 slots (contribute nothing) and point at the chunk's last
    real window (they join its run; the flush is idempotent)."""
    chunks = meta["chunks"]
    if not chunks:
        return
    E = meta["e_tile"]
    T_max = max(t1 - t0 for t0, t1, _, _ in chunks)
    W_max = max(w1 - w0 for _, _, w0, w1 in chunks)
    n_c = len(chunks)
    T_new = n_c * T_max
    new = {
        "out_block": np.zeros(T_new, np.int32),
        "sblock": np.zeros(T_new, np.int32),
        "dst3": np.full((T_new, 1, E), -1, np.int32),
        "srcl3": np.full((T_new, 1, E), -1, np.int32),
    }
    if "w3" in arrays:
        new["w3"] = np.zeros((T_new, 1, E), np.float32)
    if "edge_pos" in arrays:
        new["edge_pos"] = np.zeros((T_new, 1, E), np.int32)
    new_chunks = []
    for i, (t0, t1, w0, w1) in enumerate(chunks):
        nt = t1 - t0
        base = i * T_max
        for k in new:
            new[k][base : base + nt] = arrays[k][t0:t1]
        # pad tiles join the chunk's last real window: all -1 slots add
        # nothing, and the aliased flush just rewrites the same value.
        # They also revisit the last real tile's x block so the pad tail
        # never forces an extra x-block DMA refetch (ADVICE r4).
        new["out_block"][base + nt : base + T_max] = w1 - 1
        if nt:
            new["sblock"][base + nt : base + T_max] = arrays["sblock"][t1 - 1]
        new_chunks.append((base, base + T_max, int(w0), int(w1)))
    arrays.update(new)
    meta["chunks"] = tuple(new_chunks)
    meta["chunk_blocks"] = int(W_max)


def stream_plan_from_host(arrays: dict, meta: dict) -> StreamPlan:
    return StreamPlan(
        out_block=jnp.asarray(arrays["out_block"]),
        sblock=jnp.asarray(arrays["sblock"]),
        dst3=jnp.asarray(arrays["dst3"]),
        srcl3=jnp.asarray(arrays["srcl3"]),
        w3=jnp.asarray(arrays["w3"]) if "w3" in arrays else None,
        edge_pos=(
            jnp.asarray(arrays["edge_pos"]) if "edge_pos" in arrays else None
        ),
        **meta,
    )
