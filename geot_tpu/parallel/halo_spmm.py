"""Multi-chip SpMM: padded all-to-all halo exchange + local segment reduce.

New-design component (the reference is single-GPU, SURVEY §2.7). Execution
of one distributed aggregation `out[d] = Σ_e w_e · x[s_e]` on a mesh axis
'parts' (P chips), with the graph pre-partitioned by `partition_graph`:

  1. each chip gathers the rows its peers need from its local feature shard
     and exchanges them with ONE `lax.all_to_all` (rides ICI; payload is the
     halo schedule's padded slots, not the full feature matrix);
  2. local edges read sources from the receive buffer and reduce into the
     chip's own destination rows via the same Pallas segment-sum kernels as
     the single-chip path — outputs are final, no cross-chip combine.

Backward is the mirror image (custom_vjp): partial gradients are reduced
*by receive-buffer position* (transpose plan), all-to-all'd back to the
owners, and scatter-added into the local gradient shard. All collectives
are XLA collectives inside `shard_map`; no other communication exists.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from geot_tpu.graph.plan import SegmentPlan
from geot_tpu.parallel.bat_partition import part_bat_reduce
from geot_tpu.parallel.partition import PartitionedGraph

__all__ = ["halo_spmm", "node_sharding", "block_nodes", "unblock_nodes", "pad_nodes"]


def node_sharding(mesh: Mesh, axis: str = "parts") -> NamedSharding:
    """Sharding for node-indexed arrays: rows split over the mesh axis."""
    return NamedSharding(mesh, P(axis))


def _block_index(pg: PartitionedGraph):
    """(gather_index [P*npp], valid [P*npp]) mapping blocked rows → global
    node ids for the edge-balanced variable-width ranges."""
    import numpy as np

    starts = np.asarray(pg.part_start[:-1], np.int64)
    ends = np.asarray(pg.part_start[1:], np.int64)
    npp = pg.nodes_per_part
    idx = (starts[:, None] + np.arange(npp)[None, :]).reshape(-1)
    valid = idx < np.repeat(ends, npp)
    return np.minimum(idx, pg.num_nodes - 1), valid


def block_nodes(x: jax.Array, pg: PartitionedGraph) -> jax.Array:
    """[num_nodes, ...] → blocked [P*nodes_per_part, ...] layout: part p's
    rows at [p*npp, p*npp + width_p), zero padding beyond. Row counts per
    part are unequal (edge-balanced ranges), so this is a gather, not a
    reshape."""
    idx, valid = _block_index(pg)
    out = x[jnp.asarray(idx)]
    v = jnp.asarray(valid).reshape((-1,) + (1,) * (x.ndim - 1))
    return out * v.astype(out.dtype) if jnp.issubdtype(out.dtype, jnp.inexact) else jnp.where(v, out, 0)


def unblock_nodes(xb: jax.Array, pg: PartitionedGraph) -> jax.Array:
    """Inverse of `block_nodes`: blocked [P*npp, ...] → [num_nodes, ...]."""
    import numpy as np

    starts = np.asarray(pg.part_start[:-1], np.int64)
    g = np.arange(pg.num_nodes)
    owner = np.searchsorted(np.asarray(pg.part_start), g, side="right") - 1
    pos = owner * pg.nodes_per_part + (g - starts[owner])
    return xb[jnp.asarray(pos)]


def pad_nodes(x: jax.Array, pg: PartitionedGraph) -> jax.Array:
    """Alias of `block_nodes` (kept for earlier call sites)."""
    return block_nodes(x, pg)


def _unbatch_plan(plan: SegmentPlan) -> SegmentPlan:
    """Strip the leading parts axis (size 1 inside shard_map)."""
    return SegmentPlan(
        src_slots=plan.src_slots[0],
        dst_slots=plan.dst_slots[0],
        edge_pos=plan.edge_pos[0],
        mask=plan.mask[0],
        out_block=plan.out_block[0],
        e_tile=plan.e_tile,
        s_tile=plan.s_tile,
        num_segments=plan.num_segments,
        n_blocks=plan.n_blocks,
        num_edges=plan.num_edges,
        num_src_nodes=plan.num_src_nodes,
    )


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _local_reduce(plan: SegmentPlan, xr: jax.Array, w_slots: jax.Array, use_pallas):
    """Segment-sum xr[src_slots] * w into [num_segments, F] via the same
    mode dispatch as the single-chip path (packed-SR for narrow features —
    round-1 shipped plain SR here and paid the 128-lane padding)."""
    vals = xr[plan.src_slots.reshape(-1)]
    if not use_pallas:
        return (
            jnp.zeros((plan.num_segments, xr.shape[1]), jnp.float32)
            .at[plan.dst_slots.reshape(-1)]
            .add(vals * w_slots.reshape(-1)[:, None], mode="drop")
            .astype(xr.dtype)
        )
    from geot_tpu.ops.api import _pick_mode, _plan_sum_one

    ws = w_slots.reshape(plan.mask.shape)
    return _plan_sum_one(plan, vals, ws, _pick_mode(xr.shape[1], plan))


def _stream_reduce(fam, x_local: jax.Array, use_pallas: bool) -> jax.Array:
    """Streamed interior reduce for one part (hybrid layout). The kernel
    interprets off-TPU, so the same (deterministic) logic serves both the
    Pallas and reference backends."""
    del use_pallas
    from geot_tpu.parallel.stream_partition import part_stream_reduce

    return part_stream_reduce(fam, x_local)


def _use_pallas(backend: str) -> bool:
    if backend == "pallas":
        return True
    if backend == "reference":
        return False
    return jax.default_backend() == "tpu"


def halo_spmm(
    x: jax.Array,
    pg: PartitionedGraph,
    mesh: Mesh,
    *,
    axis: str = "parts",
    backend: str = "auto",
) -> jax.Array:
    """Distributed weighted SpMM over a partitioned graph.

    x: [padded_nodes, F] sharded (or shardable) over `axis`. Returns the
    aggregated features with the same sharding. Differentiable (w.r.t. x;
    edge weights are baked into the partition plan).
    """
    use_pallas = _use_pallas(backend)
    spec_nodes = P(axis)
    spec_parts = P(axis)  # leading part axis on pg arrays

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec_nodes, spec_parts),
        out_specs=spec_nodes,
        check_vma=False,
    )
    def fwd_local(x_local, pg_local):
        # x_local: [nodes_per_part, F]
        send_idx = pg_local.send_idx[0]  # [P, H]
        send_mask = pg_local.send_mask[0]  # [P, H]
        send_buf = x_local[jnp.minimum(send_idx, x_local.shape[0] - 1)]
        send_buf = send_buf * send_mask[..., None].astype(send_buf.dtype)
        recv = jax.lax.all_to_all(
            send_buf, axis, split_axis=0, concat_axis=0, tiled=True
        )  # [P, H, F] — recv[q, i] = row i sent by part q
        recv = recv.reshape(-1, recv.shape[-1])  # [P*H, F]
        # interior reduce is independent of the exchange — XLA's async
        # collective scheduling runs the all-to-all concurrently with it
        # (the SURVEY §2.7 comm/compute overlap)
        if pg_local.bat is not None:
            # products-scale parts: scan-chunked BAT families (bounded
            # per-chunk gather transients — see `parallel.bat_partition`)
            out_i = part_bat_reduce(
                pg_local.bat_int.unbatch(), x_local, use_pallas
            )
            if pg_local.stream_int is not None:
                # hybrid layout: interior dense cells stream gather-free
                # from the local shard (`parallel.stream_partition`)
                out_i = out_i + _stream_reduce(
                    pg_local.stream_int.unbatch(), x_local, use_pallas
                )
            out_b = part_bat_reduce(pg_local.bat.unbatch(), recv, use_pallas)
            return out_i + out_b
        plan_b = _unbatch_plan(pg_local.plan)
        plan_i = _unbatch_plan(pg_local.plan_int)
        out_i = _local_reduce(plan_i, x_local, pg_local.w_int[0], use_pallas)
        out_b = _local_reduce(plan_b, recv, pg_local.w_slots[0], use_pallas)
        return out_i + out_b

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec_nodes, spec_parts),
        out_specs=spec_nodes,
        check_vma=False,
    )
    def bwd_local(g_local, pg_local):
        # g_local: [nodes_per_part, F] — incoming cotangent of the output.
        # boundary partials per receive-buffer position: [P*H, F]
        if pg_local.bat is not None:
            h = part_bat_reduce(
                pg_local.bat_t.unbatch(), g_local, use_pallas
            )
        else:
            plan_t = _unbatch_plan(pg_local.plan_t)
            h = _local_reduce(
                plan_t, g_local, pg_local.w_slots_t[0], use_pallas
            )
        # return each partial to the part that owns the row (reverse exchange)
        h = h.reshape(pg_local.send_idx.shape[1], pg_local.halo, -1)  # [P, H, F]
        back = jax.lax.all_to_all(
            h, axis, split_axis=0, concat_axis=0, tiled=True
        )  # [P, H, F] — back[q, i] = grad for my send slot i, from part q
        # interior gradient overlaps the reverse exchange (independent)
        if pg_local.bat is not None:
            g_int = part_bat_reduce(
                pg_local.bat_int_t.unbatch(), g_local, use_pallas
            )
            if pg_local.stream_int_t is not None:
                g_int = g_int + _stream_reduce(
                    pg_local.stream_int_t.unbatch(), g_local, use_pallas
                )
        else:
            plan_it = _unbatch_plan(pg_local.plan_int_t)
            g_int = _local_reduce(
                plan_it, g_local, pg_local.w_int_t[0], use_pallas
            )
        back = back.reshape(-1, back.shape[-1])  # [P*H, F]
        send_idx = pg_local.send_idx[0].reshape(-1)  # [P*H]
        npp = pg_local.nodes_per_part
        return (
            g_int.astype(jnp.float32)
            .at[send_idx]
            .add(back.astype(jnp.float32), mode="drop")
            .astype(g_local.dtype)
        )

    @jax.custom_vjp
    def op(x):
        return fwd_local(x, pg)

    def op_fwd(x):
        return op(x), None

    def op_bwd(_, g):
        return (bwd_local(g, pg),)

    op.defvjp(op_fwd, op_bwd)
    return op(x)
