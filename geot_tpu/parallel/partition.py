"""Graph partitioning for multi-chip execution.

The reference has no distributed layer (SURVEY §2.7 — single-GPU only);
this is the new-design component the TPU framework adds: contiguous
destination-range partitioning of a dst-sorted edge list across a device
mesh, with a precomputed **halo exchange schedule** so each chip fetches
only the remote source rows its edges actually touch (a padded all-to-all,
not a full all_gather).

Partition invariants (P parts, nodes padded to P*nodes_per_part):
  * part p owns destination rows [p*npp, (p+1)*npp) — because edges are
    dst-sorted, its edge list is a contiguous slice; the segment-reduce
    output needs no cross-chip combining.
  * every part's local edges reference sources through a *receive buffer*
    of shape [P, H]: slot (q, i) holds the i-th row part q sends here.
    `send_idx[p, q, i]` = local row part p sends to part q in slot i.
  * per-part SegmentPlans are padded to identical static shapes so the same
    program runs on every chip under shard_map.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from geot_tpu.graph.plan import SegmentPlan, build_segment_plan

__all__ = ["PartitionedGraph", "partition_graph"]


def _cdiv(a, b):
    return -(-a // b)


def _stack_plans(plans, num_segments, n_blocks, num_src) -> SegmentPlan:
    """Stack per-part plans (already padded to equal tile counts) into one
    SegmentPlan whose array fields carry a leading part axis."""
    return SegmentPlan(
        src_slots=jnp.stack([p.src_slots for p in plans]),
        dst_slots=jnp.stack([p.dst_slots for p in plans]),
        edge_pos=jnp.stack([p.edge_pos for p in plans]),
        mask=jnp.stack([p.mask for p in plans]),
        out_block=jnp.stack([p.out_block for p in plans]),
        e_tile=plans[0].e_tile,
        s_tile=plans[0].s_tile,
        num_segments=num_segments,
        n_blocks=n_blocks,
        num_edges=max(p.num_edges for p in plans),
        num_src_nodes=num_src,
    )


def _pad_plan_tiles(plan: SegmentPlan, num_tiles: int, n_blocks: int) -> SegmentPlan:
    """Append all-padding tiles (targeting the last covered window, or new
    empty windows) so every part reaches the same tile/block count."""
    t0 = plan.num_tiles
    extra = num_tiles - t0
    if extra == 0 and plan.n_blocks == n_blocks:
        return plan
    # distribute the extra coverage tiles over any windows beyond the part's
    # own n_blocks first (each needs >=1 tile for output init), then repeat
    # the final window.
    blocks = list(np.asarray(plan.out_block))
    new_blocks = list(range(plan.n_blocks, n_blocks))
    while len(new_blocks) < extra:
        new_blocks.append(n_blocks - 1 if n_blocks else 0)
    new_blocks = new_blocks[:extra]
    assert len(new_blocks) == extra and sorted(new_blocks) == new_blocks
    e_tile = plan.e_tile
    pad_dst = (
        np.asarray(new_blocks, np.int32)[:, None] * plan.s_tile
    ) * np.ones((1, e_tile), np.int32)
    z = np.zeros((extra, e_tile), np.int32)
    return SegmentPlan(
        src_slots=jnp.concatenate([plan.src_slots, jnp.asarray(z)]),
        dst_slots=jnp.concatenate([plan.dst_slots, jnp.asarray(pad_dst)]),
        edge_pos=jnp.concatenate([plan.edge_pos, jnp.asarray(z)]),
        mask=jnp.concatenate([plan.mask, jnp.zeros((extra, e_tile), jnp.float32)]),
        out_block=jnp.concatenate(
            [plan.out_block, jnp.asarray(np.asarray(new_blocks, np.int32))]
        ),
        e_tile=plan.e_tile,
        s_tile=plan.s_tile,
        num_segments=plan.num_segments,
        n_blocks=n_blocks,
        num_edges=plan.num_edges,
        num_src_nodes=plan.num_src_nodes,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PartitionedGraph:
    """Per-part plans + halo schedule, array fields batched over parts.

    Edges are split at partition time into INTERIOR (source owned by the
    same part — reduced straight from the local feature shard, no
    communication) and BOUNDARY (remote source — reduced from the halo
    receive buffer). The split is what lets `halo_spmm` overlap the
    all-to-all with the interior reduction (SURVEY §2.7 north star):
    the interior kernel has no data dependence on the exchange.

    plan:     boundary forward SegmentPlan; src_slots hold *receive-buffer
              positions* (q*H + i), dst_slots hold part-local destinations.
    plan_t:   transpose plan grouping boundary edges by receive-buffer
              position (backward scatter of gradients to feature owners).
    plan_int: interior forward plan; src_slots hold part-local rows.
    plan_int_t: interior transpose plan (grouped by local source row).
    send_idx:  [P, P, H] int32 — local row sent to peer q, slot i (npp =
               drop); the diagonal (q == p) is empty — interior rows never
               ride the exchange.
    send_mask: [P, P, H] float32 — 1.0 where the slot is a real row.
    w_slots / w_slots_t:   [P, T, e_tile] boundary slot weights.
    w_int / w_int_t:       [P, T, e_tile] interior slot weights.
    """

    plan: Optional[SegmentPlan]
    plan_t: Optional[SegmentPlan]
    plan_int: Optional[SegmentPlan]
    plan_int_t: Optional[SegmentPlan]
    send_idx: jax.Array
    send_mask: jax.Array
    w_slots: Optional[jax.Array]
    w_slots_t: Optional[jax.Array]
    w_int: Optional[jax.Array]
    w_int_t: Optional[jax.Array]
    num_parts: int = dataclasses.field(metadata=dict(static=True))
    nodes_per_part: int = dataclasses.field(metadata=dict(static=True))
    halo: int = dataclasses.field(metadata=dict(static=True))
    # global node id where each part's range begins (+ total): length P+1.
    # Static (host-known) — drives the blocked node layout.
    part_start: tuple = dataclasses.field(default=(), metadata=dict(static=True))
    num_nodes: int = dataclasses.field(default=0, metadata=dict(static=True))
    # scan-chunked BAT families (products-scale parts where the slot plans
    # exceed the prefetch/gather budgets — see `parallel.bat_partition`):
    # boundary fwd/bwd, interior fwd/bwd. When set, the slot fields above
    # are None and `halo_spmm` routes through `part_bat_reduce`.
    bat: Optional[object] = None
    bat_t: Optional[object] = None
    bat_int: Optional[object] = None
    bat_int_t: Optional[object] = None
    # layout='hybrid': streamed interior dense cells (PartStreamFamily);
    # the interior BAT families then hold only the residue. Forward and
    # backward are independent splits (see `parallel.stream_partition`).
    stream_int: Optional[object] = None
    stream_int_t: Optional[object] = None

    @property
    def padded_nodes(self) -> int:
        return self.num_parts * self.nodes_per_part


def _balanced_bounds(dst_sorted: np.ndarray, num_nodes: int, P: int) -> np.ndarray:
    """Contiguous node-range boundaries with ~equal edges per part (the
    partition-level analogue of the nnz-balanced schedule inside the plan;
    equal-NODE splits put most edges on one chip for power-law graphs)."""
    nnz = len(dst_sorted)
    bounds = np.zeros(P + 1, np.int64)
    bounds[P] = num_nodes
    for p in range(1, P):
        pos = (p * nnz) // P
        b = int(dst_sorted[min(pos, nnz - 1)]) if nnz else (p * num_nodes) // P
        bounds[p] = min(max(b, bounds[p - 1] + 1), num_nodes - (P - p))
    return bounds


def partition_graph(
    src,
    dst,
    num_nodes: int,
    num_parts: int,
    *,
    edge_weight=None,
    e_tile: int = 256,
    s_tile: int = 256,
    layout: str = "auto",
    feature_hint: int = 128,
    bat_e_tile: int = 1024,
    max_chunk_tiles: int = 0,
) -> PartitionedGraph:
    """Host-side partitioning of a COO edge list (any order) into
    `num_parts` dst-contiguous, edge-balanced parts with a halo exchange
    schedule. Part p owns global nodes [part_start[p], part_start[p+1]),
    stored in a padded block of `nodes_per_part` local rows (use
    `halo_spmm.block_nodes` / `unblock_nodes` for the layout).

    Weights (if given) are baked into the plan's slot weights — pass the
    final aggregation weights (e.g. GCN-normalized; see
    `geot_tpu.models.gcn_edge_weight` computed on the full graph first).
    """
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    w = None if edge_weight is None else np.asarray(edge_weight, np.float32)
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    if w is not None:
        w = w[order]

    P = int(num_parts)
    starts = _balanced_bounds(dst, num_nodes, P)
    npp = int(max(np.diff(starts).max(), 1)) if P else 1
    # round the padded block to a sublane multiple
    npp = _cdiv(npp, 8) * 8
    bounds = np.searchsorted(dst, starts)
    owner_of = np.searchsorted(starts, np.arange(num_nodes), side="right") - 1

    # halo schedule: unique REMOTE sources each part needs from each owner;
    # interior edges (source owned locally) bypass the exchange entirely
    send_lists = [[[] for _ in range(P)] for _ in range(P)]  # [owner][dest_part]
    recv_pos_parts = []  # boundary edges: (owner, slot) per edge
    bnd_dst_parts = []
    int_src_parts = []
    int_dst_parts = []
    w_bnd_parts = []
    w_int_parts = []
    for p in range(P):
        lo, hi = bounds[p], bounds[p + 1]
        s_p, d_p = src[lo:hi], dst[lo:hi]
        w_p = None if w is None else w[lo:hi]
        is_int = owner_of[s_p] == p if len(s_p) else np.zeros(0, bool)
        int_src_parts.append(s_p[is_int] - starts[p])
        int_dst_parts.append(d_p[is_int] - starts[p])
        w_int_parts.append(None if w_p is None else w_p[is_int])
        s_b, d_b = s_p[~is_int], d_p[~is_int]
        w_b = None if w_p is None else w_p[~is_int]
        # unique (owner, remote_src) pairs → slot within that owner's list
        uniq, inv = np.unique(s_b, return_inverse=True)
        uo = owner_of[uniq]
        slot_of_uniq = np.empty(len(uniq), np.int64)
        for q in range(P):
            sel = np.where(uo == q)[0]
            slot_of_uniq[sel] = np.arange(len(sel))
            send_lists[q][p] = (uniq[sel] - starts[q]).astype(np.int64)
        recv_pos_parts.append((uo[inv], slot_of_uniq[inv]))
        bnd_dst_parts.append(d_b - starts[p])
        w_bnd_parts.append(w_b)

    H = max(
        (len(send_lists[q][p]) for q in range(P) for p in range(P)), default=1
    )
    H = max(H, 1)
    # round H up to a lane multiple so [P*H] reductions tile cleanly
    H = _cdiv(H, 8) * 8

    send_idx = np.full((P, P, H), npp, dtype=np.int32)  # npp ⇒ dropped slot
    send_mask = np.zeros((P, P, H), dtype=np.float32)
    for q in range(P):
        for p in range(P):
            lst = send_lists[q][p]
            send_idx[q, p, : len(lst)] = lst
            send_mask[q, p, : len(lst)] = 1.0

    # Layout choice. The slot plans must fit the SMEM scalar-prefetch
    # budget AND gather all edges' source rows in one op; past either
    # budget the scan-chunked BAT families take over (chunk windows ride
    # as per-part data through `_bat_sum_scan(chunk_meta=...)`, so the one
    # shard_map program stays valid — see `parallel.bat_partition`).
    from geot_tpu.graph.plan import MAX_PREFETCH_TILES

    max_edges = max(
        (int(len(d)) for d in bnd_dst_parts + int_dst_parts), default=0
    )
    if layout == "auto":
        gather_bytes = max_edges * max(feature_hint, 1) * 4
        layout = (
            "bat"
            if _cdiv(max(max_edges, 1), 4096) > MAX_PREFETCH_TILES
            or gather_bytes > (1 << 30)
            else "slot"
        )
    if layout == "slot":
        # auto-bump e_tile until the plan fits (products/P=8 fits at 1024)
        while _cdiv(max(max_edges, 1), e_tile) > MAX_PREFETCH_TILES:
            if e_tile >= 4096:
                raise ValueError(
                    f"part with {max_edges} edges exceeds the scalar-"
                    f"prefetch budget even at e_tile={e_tile}; use "
                    f"layout='bat' or more parts"
                )
            e_tile *= 2

    def _weights_for(plan, ww):
        if ww is None or len(ww) == 0:
            return np.asarray(plan.mask)
        ep = np.asarray(plan.edge_pos).reshape(-1)
        ws = ww[np.minimum(ep, len(ww) - 1)].reshape(plan.mask.shape)
        return ws * np.asarray(plan.mask)

    def _build_family(dst_parts, src_parts, w_parts_, num_seg, num_src):
        """Per-part (fwd, bwd) plans + slot weights for one edge family,
        padded to identical static shapes across parts."""
        fwd_plans, bwd_plans, w_f, w_b = [], [], [], []
        for p in range(P):
            d_loc = dst_parts[p]
            s_loc = src_parts[p]
            w_p = w_parts_[p]
            fwd = build_segment_plan(
                d_loc, s_loc, num_seg, e_tile=e_tile, s_tile=s_tile,
                num_src_nodes=num_src,
            )
            tperm = np.argsort(s_loc, kind="stable")
            bwd = build_segment_plan(
                s_loc[tperm], d_loc[tperm], num_src,
                e_tile=e_tile, s_tile=s_tile, num_src_nodes=num_seg,
            )
            fwd_plans.append(fwd)
            bwd_plans.append(bwd)
            w_f.append(_weights_for(fwd, w_p))
            w_b.append(
                _weights_for(bwd, None if w_p is None else w_p[tperm])
            )
        T_f = max(p.num_tiles for p in fwd_plans)
        T_b = max(p.num_tiles for p in bwd_plans)
        nb_f = max(p.n_blocks for p in fwd_plans)
        nb_b = max(p.n_blocks for p in bwd_plans)
        fwd_plans = [_pad_plan_tiles(p, T_f, nb_f) for p in fwd_plans]
        bwd_plans = [_pad_plan_tiles(p, T_b, nb_b) for p in bwd_plans]
        w_f = [np.pad(ws, ((0, T_f - ws.shape[0]), (0, 0))) for ws in w_f]
        w_b = [np.pad(ws, ((0, T_b - ws.shape[0]), (0, 0))) for ws in w_b]
        return (
            _stack_plans(fwd_plans, num_seg, nb_f, num_src),
            _stack_plans(bwd_plans, num_src, nb_b, num_seg),
            jnp.asarray(np.stack(w_f), dtype=jnp.float32),
            jnp.asarray(np.stack(w_b), dtype=jnp.float32),
        )

    halo_total = P * H
    recv_pos_arrs = [
        (uo * H + slot).astype(np.int64) for uo, slot in recv_pos_parts
    ]
    common = dict(
        send_idx=jnp.asarray(send_idx),
        send_mask=jnp.asarray(send_mask),
        num_parts=P,
        nodes_per_part=int(npp),
        halo=int(H),
        part_start=tuple(int(b) for b in starts),
        num_nodes=int(num_nodes),
    )
    if layout in ("bat", "hybrid"):
        from geot_tpu.parallel.bat_partition import build_part_bat_family

        mct = max_chunk_tiles or max(
            1,
            min(
                MAX_PREFETCH_TILES,
                (1 << 30) // (max(feature_hint, 1) * 4 * bat_e_tile),
            ),
        )
        kw = dict(e_tile=bat_e_tile, s_tile=s_tile, max_chunk_tiles=mct)

        def _sorted_by(key_parts, *arr_parts):
            perms = [np.argsort(k, kind="stable") for k in key_parts]
            outs = [[k[q] for k, q in zip(key_parts, perms)]]
            for arrs in arr_parts:
                outs.append(
                    [None if a is None else a[q] for a, q in zip(arrs, perms)]
                )
            return outs

        bat = build_part_bat_family(
            bnd_dst_parts, recv_pos_arrs, w_bnd_parts, npp, **kw
        )
        pos_s, dst_s, w_s = _sorted_by(
            recv_pos_arrs, bnd_dst_parts, w_bnd_parts
        )
        bat_t = build_part_bat_family(pos_s, dst_s, w_s, halo_total, **kw)

        # 'hybrid': interior dense cells stream from the LOCAL feature
        # shard (they are exactly the intra-community edges a clustered
        # partition concentrates); the interior residue and all boundary
        # edges stay on the scan-chunked BAT families. Forward and
        # backward splits are independent — each direction reduces its own
        # edge copy (VERDICT r4 Next #5).
        stream_i = stream_i_t = None
        int_rest = (int_dst_parts, int_src_parts, w_int_parts)
        src_s, dsti_s, wi_s = _sorted_by(
            int_src_parts, int_dst_parts, w_int_parts
        )
        int_rest_t = (src_s, dsti_s, wi_s)
        if layout == "hybrid":
            from geot_tpu.parallel.stream_partition import (
                build_part_stream_family,
            )

            # stream tiles are decoupled from the BAT edge blocks: one
            # FORCED family per part (shard_map uniformity), and E=512
            # keeps mid-density cells economical (TILE_NS(512)=1.5 us vs
            # 3.4 us at 1024 — at part-local table sizes the crossover
            # cell is ~270 edges vs ~610). The caller asked for hybrid
            # explicitly, so the scale margin cushion is waived (the
            # per-cell cost model still drops cells the stream loses on).
            skw = dict(
                e_tile=min(bat_e_tile, 512), s_tile=s_tile,
                feature_hint=feature_hint, margin=1.0,
            )
            stream_i, masks, _ = build_part_stream_family(
                int_dst_parts, int_src_parts, w_int_parts, npp, npp, **skw
            )
            if stream_i is not None:
                int_rest = tuple(
                    [
                        None if a is None else a[m]
                        for a, m in zip(arrs, masks)
                    ]
                    for arrs in int_rest
                )
            stream_i_t, masks_t, _ = build_part_stream_family(
                src_s, dsti_s, wi_s, npp, npp, **skw
            )
            if stream_i_t is not None:
                int_rest_t = tuple(
                    [
                        None if a is None else a[m]
                        for a, m in zip(arrs, masks_t)
                    ]
                    for arrs in int_rest_t
                )
        bat_i = build_part_bat_family(*int_rest, npp, **kw)
        bat_i_t = build_part_bat_family(*int_rest_t, npp, **kw)
        return PartitionedGraph(
            plan=None,
            plan_t=None,
            plan_int=None,
            plan_int_t=None,
            w_slots=None,
            w_slots_t=None,
            w_int=None,
            w_int_t=None,
            bat=bat,
            bat_t=bat_t,
            bat_int=bat_i,
            bat_int_t=bat_i_t,
            stream_int=stream_i,
            stream_int_t=stream_i_t,
            **common,
        )

    plan_b, plan_b_t, w_bnd, w_bnd_t = _build_family(
        bnd_dst_parts, recv_pos_arrs, w_bnd_parts, npp, halo_total
    )
    plan_i, plan_i_t, w_int, w_int_t = _build_family(
        int_dst_parts, int_src_parts, w_int_parts, npp, npp
    )

    return PartitionedGraph(
        plan=plan_b,
        plan_t=plan_b_t,
        plan_int=plan_i,
        plan_int_t=plan_i_t,
        w_slots=w_bnd,
        w_slots_t=w_bnd_t,
        w_int=w_int,
        w_int_t=w_int_t,
        **common,
    )
