"""Graph container with cached execution plans.

Plays the role of PyG's `SparseTensor adj_t` in the reference model zoo
(`models/utils.py:36-55`): a preprocessed, dst-sorted adjacency carrying
everything the fused ops need — including the forward SegmentPlan and the
transpose (src-sorted) plan so backward passes never re-sort edges. (GeoT
pays a full `torch.sort` per backward call, `geot/gather_weight_scatter.py:41`;
here the CSC permutation is precomputed once, per SURVEY §7.)

Static edge weights (e.g. GCN's symmetric normalization) are additionally
cached in *slot order* (`w_slots`/`w_slots_t`) at build time: permuting
nnz scalars into the tile layout at every forward is a random scalar
gather that measures ~half the whole SpMM cost on TPU, so it is hoisted
here, amortized like the rest of the plan.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from geot_tpu.graph.plan import (
    MAX_PREFETCH_TILES,
    BatPlan,
    SegmentPlan,
    build_segment_plan_host,
    plan_from_host,
)

__all__ = ["Graph", "build_graph", "LAST_BUILD_STATS"]

# Introspection of the most recent `build_graph` decisions (which mechanism
# — measured table vs census gate — decided the stream split, etc.). For
# logging and the dispatch-audit tests; not part of the Graph pytree.
LAST_BUILD_STATS: dict = {}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Graph:
    """dst-sorted COO adjacency + plans.

    src, dst: [nnz] int32, sorted by dst ascending.
    edge_weight: [nnz] float or None — static per-edge weights.
    plan: forward SegmentPlan (reduce over dst).
    plan_t: transpose plan (reduce over src) — drives backward / A^T @ X.
    perm_t: [nnz] int32 — position in dst-sorted order of the e-th edge of
      the src-sorted order (edge_attr_t = edge_attr[perm_t]).
    w_slots / w_slots_t: [T, e_tile] slot-ordered (mask-applied) copies of
      edge_weight for the fwd / transpose plans, or None.
    """

    src: jax.Array
    dst: jax.Array
    edge_weight: Optional[jax.Array]
    plan: SegmentPlan
    plan_t: SegmentPlan
    perm_t: jax.Array
    w_slots: Optional[jax.Array]
    w_slots_t: Optional[jax.Array]
    # transpose-plan slot -> position in the CALLER'S (dst-sorted) edge
    # order, precomposed host-side (perm_t[plan_t.edge_pos]) so dynamic
    # per-call edge weights reach the backward without two runtime
    # permutations
    edge_pos_t: Optional[jax.Array] = None
    # v3 block-aligned-tile plans (fast path for sum-reduce SpMM /
    # index_scatter): forward over dst-sorted edges, transpose over
    # src-sorted edges; dst_t = dst[perm_t] (the transpose gather index),
    # edge_weight_t = edge_weight[perm_t] (static weights, transpose order)
    bat: Optional["BatPlan"] = None
    bat_t: Optional["BatPlan"] = None
    dst_t: Optional[jax.Array] = None
    edge_weight_t: Optional[jax.Array] = None
    # bucketed BAT plans (src-bucket-sorted edges, sliced-table gather) —
    # built for large node tables; static/baked-weight fast path only
    bat_b: Optional[object] = None
    bat_b_t: Optional[object] = None
    # hybrid stream+gather plans (community-structured graphs): dense
    # (dst-window x src-block) cells run the gather-free streaming kernel,
    # sparse cells keep the BAT+gather path (`graph/stream_plan.py`).
    # Static/baked-weight fast path; None when the cell census says the
    # graph has no locality worth streaming.
    hyb: Optional[object] = None
    hyb_t: Optional[object] = None
    num_nodes: int = dataclasses.field(default=0, metadata=dict(static=True))
    # measured-table layout preference for the fused SpMM (static-weight /
    # per-call-weight op families): 'bat', 'bat_packed', 'sr', 'packed' —
    # set from the tuning table at build, consulted by the op dispatcher
    prefer: str = dataclasses.field(default="bat", metadata=dict(static=True))
    prefer_dyn: str = dataclasses.field(
        default="bat", metadata=dict(static=True)
    )

    @property
    def num_edges(self) -> int:
        return int(self.src.shape[0])


def _stable_sort_perm(key: np.ndarray, num_keys: int) -> np.ndarray:
    """Counting-sort permutation via the native runtime when available
    (O(nnz), multithreaded histogram); numpy argsort fallback."""
    from geot_tpu import native

    perm = native.sort_by_key(np.asarray(key, np.int32), int(num_keys))
    if perm is not None:
        return perm
    return np.argsort(key, kind="stable")


def _slot_weights_host(arrays: dict, w: np.ndarray) -> np.ndarray:
    ep = arrays["edge_pos"].reshape(-1)
    mask = arrays["mask"]
    ws = w[np.minimum(ep, len(w) - 1)].reshape(mask.shape)
    return (ws * mask).astype(np.float32)


def build_graph(
    src,
    dst,
    num_nodes: int,
    edge_weight=None,
    *,
    e_tile: Optional[int] = None,
    s_tile: Optional[int] = None,
    bat_e_tile: Optional[int] = None,
    bat_s_tile: Optional[int] = None,
    feature_hint: int = 128,
    assume_sorted: bool = False,
    layouts: Tuple[str, ...] = ("bat", "slot", "stream"),
) -> Graph:
    """Host-side graph preprocessing: sort by dst, build fwd + transpose plans.

    Tile shapes default to the tuning layer's pick for
    (feature_hint, nnz, avg degree) — the role of GeoT's decision-tree
    launch rules (`csrc/cuda/wrapper/index_scatter_rule.h`), consulted once
    at build instead of per call because the plan is precomputed.

    `layouts` selects which plan families to build. `("bat",)` skips the
    slot-layout SegmentPlans (and their cached slot weights) — at
    products scale those are ~3 GB of HBM and minutes of host build the
    BAT execution path never touches. Ops that need a slot plan (mh_spmm,
    PR layout) raise if called on a bat-only graph; `segment_spmm` /
    `index_scatter` / autograd run entirely on the BAT plans.
    """
    src = np.asarray(src, dtype=np.int32)
    dst = np.asarray(dst, dtype=np.int32)
    mode_hint = "auto"
    prefer = prefer_dyn = "bat"
    table_picked = None  # winning mode when the tuning layer chose tiles
    if e_tile is None or s_tile is None or bat_e_tile is None:
        # measured-table (or analytic-heuristic) winners drive BOTH plan
        # families' tiles and the static/dynamic spmm layout preference —
        # the decision-tree role of the reference's launch rules
        # (`csrc/cuda/wrapper/index_scatter_rule.h`), consulted once here
        from geot_tpu.tuning.heuristics import select_config

        cfg_s = select_config(feature_hint, len(src), num_nodes, op="spmm")
        cfg_d = select_config(
            feature_hint, len(src), num_nodes, op="spmm_dyn"
        )
        prefer, prefer_dyn = cfg_s.mode, cfg_d.mode
        table_picked = prefer if prefer != "xla" else prefer_dyn
        slot_cfgs = [c for c in (cfg_s, cfg_d) if c.mode in ("sr", "packed")]
        bat_cfgs = [c for c in (cfg_s, cfg_d) if c.mode.startswith("bat")]
        if slot_cfgs:
            e_tile = e_tile or slot_cfgs[0].e_tile
            s_tile = s_tile or slot_cfgs[0].s_tile
            mode_hint = slot_cfgs[0].mode
        if bat_cfgs and bat_e_tile is None:
            bat_e_tile = bat_cfgs[0].e_tile
            bat_s_tile = bat_s_tile or bat_cfgs[0].s_tile
    e_tile = e_tile or 512
    s_tile = s_tile or 256
    if edge_weight is not None:
        edge_weight = np.asarray(edge_weight, dtype=np.float32)
    if not assume_sorted:
        order = _stable_sort_perm(dst, num_nodes)
        src, dst = src[order], dst[order]
        if edge_weight is not None:
            edge_weight = edge_weight[order]
    # wide features never touch the packed kernels, so pack alignment can be
    # 1 — which routes slot construction through the multithreaded native
    # builder (3-5x faster host build; decisive at products scale)
    from geot_tpu.graph.plan import packed_width as _pw

    pa = 16 if (feature_hint and _pw(feature_hint)) else 1
    from geot_tpu.graph.plan import (
        build_bat_plan,
        build_bucketed_bat_plan,
        packed_width,
    )

    nw = packed_width(feature_hint) if feature_hint else 0
    km_pack = (128 // nw) if nw else 0
    if table_picked in ("bat", "sr"):
        # honor the measured winner's PACKEDNESS, not just the feature
        # width: at narrow N the packed one-hot loop can lose to plain
        # BAT's 128-lane padding (collab N=8: plain 13.0 ms vs packed
        # 21.9 ms, resweep_small) — a 'bat' table winner must yield an
        # unpacked plan or dispatch runs a config the sweep rejected.
        # Only when the tuning layer made the pick; explicit-tile builds
        # keep the feature-width default.
        km_pack = 0
    # transpose: reduce over src; edges sorted by src
    perm_t = _stable_sort_perm(src, num_nodes)
    plan = plan_t = w_slots = w_slots_t = ep_t = None
    if "slot" in layouts:
        arrs, meta = build_segment_plan_host(
            dst, src, num_nodes, e_tile=e_tile, s_tile=s_tile,
            num_src_nodes=num_nodes, mode_hint=mode_hint, pack_align=pa,
        )
        arrs_t, meta_t = build_segment_plan_host(
            src[perm_t],
            dst[perm_t],
            num_nodes,
            e_tile=e_tile,
            s_tile=s_tile,
            num_src_nodes=num_nodes,
            mode_hint=mode_hint,
            pack_align=pa,
        )
        if edge_weight is not None and len(edge_weight):
            # slot weights from the host arrays (no device round-trip)
            w_slots = jnp.asarray(_slot_weights_host(arrs, edge_weight))
            w_slots_t = jnp.asarray(
                _slot_weights_host(arrs_t, edge_weight[perm_t])
            )
        ep_t = perm_t.astype(np.int64)[arrs_t["edge_pos"].reshape(-1)].reshape(
            arrs_t["edge_pos"].shape
        ) if len(src) else arrs_t["edge_pos"]
        ep_t = jnp.asarray(np.asarray(ep_t, np.int32))
        plan = plan_from_host(arrs, meta, km_pack=km_pack)
        plan_t = plan_from_host(arrs_t, meta_t, km_pack=km_pack)
    src_t = src[perm_t]
    # BAT tiles: e=1024 measured fastest for wide features (bat_sweep,
    # arxiv N=128: 3.27 ms vs 3.41 at e=512); packed narrow-N layouts keep
    # e=512 (rows_tile = e/pack granularity). Chunks exist ONLY for the
    # SMEM scalar-prefetch cap — measured (meas4): chunked "pipelining"
    # does NOT overlap gather with kernel on TPU (XLA executes fusions
    # sequentially on the core) and costs ~0.5 ms in slicing overhead.
    bat = bat_t = bat_b = bat_b_t = None
    if "bat" in layouts:
        bat_e = bat_e_tile or (
            1024 if (nw == 0 and e_tile * 2 <= 1024) else e_tile
        )
        bat_s = bat_s_tile or s_tile
        # chunk cap by GATHER BYTES, not just the SMEM tile cap: a chunk
        # materializes [tiles*e_tile, feature] f32 and depth-2 pipelining
        # keeps two live — at the SMEM cap (8192×1024 edges, N=128) that's
        # 2×4.3 GB and products-scale graphs OOM a 16 GB chip.
        row_b = max(feature_hint if feature_hint else 128, 1) * 4
        budget = int(os.environ.get("GEOT_MAX_CHUNK_BYTES", 1 << 30))
        mct = max(min(MAX_PREFETCH_TILES, budget // (row_b * bat_e)), 1)
        bat = build_bat_plan(dst, num_nodes, e_tile=bat_e, s_tile=bat_s,
                             km_pack=km_pack, max_chunk_tiles=mct)
        bat_t = build_bat_plan(src_t, num_nodes, e_tile=bat_e, s_tile=bat_s,
                               km_pack=km_pack, max_chunk_tiles=mct)
        # bucketed variant (OPT-IN via GEOT_BUCKET_TABLE_BYTES): re-sort
        # edges by source bucket so each chunk gathers from a sliced
        # sub-table. Measured on products/v5e: the sliced gather IS ~2-4x
        # faster per row, but src-bucketing dilutes each bucket's dst
        # density ~n_buckets-fold, inflating (window, block) tile count and
        # kernel time by more than the gather saves (1179 ms vs 935 ms
        # unbucketed) — big chunks (GEOT_MAX_CHUNK_BYTES) amortize the
        # table-size gather cost more cheaply. Kept as an option: wins on
        # graphs whose dst windows stay dense per bucket (community
        # structure). Static/baked weights only.
        table_bytes = num_nodes * max(feature_hint, 1) * 4
        bucket_thresh = int(
            os.environ.get("GEOT_BUCKET_TABLE_BYTES", 1 << 62)
        )
        if nw == 0 and table_bytes > bucket_thresh:
            bat_b = build_bucketed_bat_plan(
                src, dst, num_nodes, num_nodes,
                edge_weight=edge_weight,
                e_tile=bat_e, s_tile=bat_s, max_chunk_tiles=mct,
            )
            bat_b_t = build_bucketed_bat_plan(
                dst[perm_t], src_t, num_nodes, num_nodes,
                edge_weight=(
                    None if edge_weight is None else edge_weight[perm_t]
                ),
                e_tile=bat_e, s_tile=bat_s, max_chunk_tiles=mct,
            )
    # hybrid stream+gather plans: the cell census decides whether the
    # graph's community structure makes the gather-free streaming kernel
    # worth it (build_stream_split_host returns None otherwise). Wide
    # features only — the streaming kernel has no packed narrow-N layout.
    hyb = hyb_t = None
    if "stream" in layouts and nw == 0 and len(src):
        from geot_tpu.graph.stream_plan import (
            HybridPlan,
            build_stream_split_host,
            stream_plan_from_host,
        )
        from geot_tpu.tuning.heuristics import bucket_key, load_table

        # table-vs-census reconciliation (sweep writes 'spmm_hyb:<bucket>'
        # verdict keys whenever the hybrid candidate was actually measured
        # at a swept shape): a measured LOSS vetoes the census gate, a
        # measured WIN endorses it (census still sizes the split, but the
        # scale-margin cushion is waived). Unswept shapes: census decides,
        # as before.
        verdict = load_table().get(
            f"spmm_hyb:{bucket_key(feature_hint, len(src), num_nodes)}"
        )
        stream_margin = None
        if verdict is not None and verdict.mode != "hybrid":
            LAST_BUILD_STATS["stream_decided_by"] = "table_veto"
        else:
            if verdict is not None:
                stream_margin = 1.0
                LAST_BUILD_STATS["stream_decided_by"] = "table_endorse"
            else:
                LAST_BUILD_STATS["stream_decided_by"] = "census"

        def _build_hyb(d_sorted, g_idx, w_e):
            families, rest_mask, _st = build_stream_split_host(
                d_sorted, g_idx, num_nodes, num_nodes,
                edge_weight=w_e, feature_hint=feature_hint,
                margin=stream_margin,
            )
            if families is None:
                return None
            sp = tuple(stream_plan_from_host(a, m) for a, m in families)
            rest = rest_src = rest_w = None
            if rest_mask.any():
                row_b = max(feature_hint or 128, 1) * 4
                budget = int(os.environ.get("GEOT_MAX_CHUNK_BYTES", 1 << 30))
                be = bat_e_tile or 1024
                mct_r = max(min(MAX_PREFETCH_TILES, budget // (row_b * be)), 1)
                from geot_tpu.graph.plan import build_bat_plan as _bbp

                rest = _bbp(
                    d_sorted[rest_mask], num_nodes, e_tile=be,
                    s_tile=bat_s_tile or s_tile, max_chunk_tiles=mct_r,
                )
                rest_src = jnp.asarray(g_idx[rest_mask].astype(np.int32))
                rest_w = (
                    None if w_e is None
                    else jnp.asarray(w_e[rest_mask].astype(np.float32))
                )
            return HybridPlan(sp, rest, rest_src, rest_w)

        vetoed = verdict is not None and verdict.mode != "hybrid"
        hyb = None if vetoed else _build_hyb(dst, src, edge_weight)
        if hyb is not None:
            hyb_t = _build_hyb(
                src_t, dst[perm_t],
                None if edge_weight is None else edge_weight[perm_t],
            )
            if hyb_t is None:
                # forward streams but transpose doesn't (asymmetric
                # locality): keep both on the gather path — autograd needs
                # the pair
                hyb = None
    return Graph(
        src=jnp.asarray(src),
        dst=jnp.asarray(dst),
        edge_weight=None if edge_weight is None else jnp.asarray(edge_weight),
        plan=plan,
        plan_t=plan_t,
        perm_t=jnp.asarray(perm_t.astype(np.int32)),
        w_slots=w_slots,
        w_slots_t=w_slots_t,
        edge_pos_t=ep_t,
        bat=bat,
        bat_t=bat_t,
        bat_b=bat_b,
        bat_b_t=bat_b_t,
        hyb=hyb,
        hyb_t=hyb_t,
        dst_t=jnp.asarray(dst[perm_t]),
        edge_weight_t=(
            None if edge_weight is None else jnp.asarray(edge_weight[perm_t])
        ),
        num_nodes=int(num_nodes),
        # slot-mode preferences ('sr'/'packed') degrade to 'bat' when no
        # slot plan was built; 'xla' needs no plan at all and is preserved
        prefer=(
            prefer
            if plan is not None or prefer.startswith("bat") or prefer == "xla"
            else "bat"
        ),
        prefer_dyn=(
            prefer_dyn
            if plan is not None
            or prefer_dyn.startswith("bat")
            or prefer_dyn == "xla"
            else "bat"
        ),
    )
