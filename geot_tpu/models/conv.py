"""Message-passing conv layers built on the fused segment-reduction ops.

TPU-native re-design of the reference conv zoo (`models/conv/gcnconv.py`,
`models/conv/sageconv.py`, `models/conv/ginconv.py`; GAT reached through the
mh_spmm compiler pattern, `geot/match_replace/fused_mh_spmm.py`). Instead of
PyG's `MessagePassing.propagate` + `message_and_aggregate` override
(`models/conv/gcnconv.py:258-259`), each layer is a flax module whose
aggregation is a direct call into `geot_tpu.ops.segment_spmm` /
`geot_tpu.ops.mh_spmm` over a prebuilt `Graph` — the fused op *is* the
message+aggregate step, so there is no graph-surgery compiler pass to apply
afterwards (SURVEY §7 "match_replace").

Dense transforms (`nn.Dense`) ride the MXU in whatever dtype the params are
(bf16-friendly); aggregations accumulate in float32 inside the Pallas
kernels regardless of input dtype.

All layers take `(x, graph)` where `graph` is a `geot_tpu.graph.Graph`
(dst-sorted, self-loops included where the layer expects them — see
`prepare_graph`).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from geot_tpu.graph.structures import Graph, build_graph
from geot_tpu.ops import api as ops

__all__ = [
    "gcn_edge_weight",
    "prepare_graph",
    "GCNConv",
    "SAGEConv",
    "GINConv",
    "GATConv",
    "SGConv",
    "APPNPConv",
    "MLP",
]


def prepare_graph(
    src,
    dst,
    num_nodes: int,
    *,
    add_self_loops: bool = True,
    edge_weight=None,
    normalize: Optional[str] = None,
    improved: bool = False,
    e_tile: Optional[int] = None,
    s_tile: Optional[int] = None,
    feature_hint: int = 128,
    layouts=("bat", "slot"),
) -> Graph:
    """One-time host-side adjacency prep for the conv layers: optionally add
    self-loops, dst-sort, build fwd+transpose SegmentPlans.

    The role of the reference's `Dataset.adj_t` construction
    (`models/utils.py:30-55`: add_self_loops + sort_by('row') +
    to_sparse_tensor). Self-loops must be materialized *before* planning
    because plans are shape-static.

    normalize='gcn' bakes the symmetric GCN normalization
    d_dst^-1/2 · w · d_src^-1/2 into the graph's cached slot weights
    (reference computes it per forward, `models/conv/gcnconv.py:41-57`;
    here it is graph data, hoisted out of the step entirely).
    `improved=True` uses PyG's fill_value=2 self-loops
    (`models/conv/gcnconv.py:39`, GCNConv `improved` flag).
    """
    src = np.asarray(src, dtype=np.int32)
    dst = np.asarray(dst, dtype=np.int32)
    if add_self_loops:
        # PyG `add_remaining_self_loops` semantics
        # (`models/conv/gcnconv.py:85-87`): drop existing diagonal edges,
        # then append the full diagonal at fill_value (2 when `improved`) —
        # existing self-loop weights are REPLACED, not kept alongside.
        fill = 2.0 if improved else 1.0
        keep = src != dst
        src, dst = src[keep], dst[keep]
        loop = np.arange(num_nodes, dtype=np.int32)
        if edge_weight is not None:
            edge_weight = np.concatenate(
                [
                    np.asarray(edge_weight, np.float32)[keep],
                    np.full(num_nodes, fill, np.float32),
                ]
            )
        elif improved:
            edge_weight = np.concatenate(
                [np.ones(len(src), np.float32), np.full(num_nodes, fill, np.float32)]
            )
        src = np.concatenate([src, loop])
        dst = np.concatenate([dst, loop])
    if normalize == "gcn":
        base = (
            np.ones(len(src), np.float32)
            if edge_weight is None
            else np.asarray(edge_weight, np.float32)
        )
        deg = np.zeros(num_nodes, np.float32)
        np.add.at(deg, dst, base)
        dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
        edge_weight = dinv[dst] * base * dinv[src]
    elif normalize is not None:
        raise ValueError(f"unknown normalize={normalize!r}")
    return build_graph(
        src, dst, num_nodes, edge_weight=edge_weight,
        e_tile=e_tile, s_tile=s_tile, feature_hint=feature_hint,
        layouts=layouts,
    )


def gcn_edge_weight(graph: Graph, dtype=jnp.float32) -> jax.Array:
    """Symmetric GCN normalization over an already-self-looped graph:
    w_e = d_dst^-1/2 · d_src^-1/2 (reference `models/conv/gcnconv.py:41-57`,
    SparseTensor branch). jit-compatible; order-preserving, so the graph's
    SegmentPlan stays valid."""
    base = (
        graph.edge_weight.astype(dtype)
        if graph.edge_weight is not None
        else jnp.ones(graph.num_edges, dtype)
    )
    deg = jnp.zeros(graph.num_nodes, dtype).at[graph.dst].add(base, mode="drop")
    dinv = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
    return dinv[graph.dst] * base * dinv[graph.src]


class GCNConv(nn.Module):
    """Graph convolution: out = Â @ (X W) + b with Â = D^-1/2 (A+I) D^-1/2.

    Reference: `models/conv/gcnconv.py:101-259` (`GCNConv_GS`), whose
    `message_and_aggregate` calls GeoT's weighted SpMM
    (`models/conv/spmm.py:10-14`). Here the normalized edge weights feed
    `segment_spmm` directly. The graph must already contain self-loops
    (use `prepare_graph`). With `normalize=True`: if the graph carries
    cached slot weights (`prepare_graph(..., normalize='gcn')`) those are
    taken as the normalization (fast path); otherwise the degree norm is
    computed per forward. Set `normalize=False` to aggregate with the
    graph's own weights (or unweighted).
    """

    features: int
    use_bias: bool = True
    normalize: bool = True
    backend: str = "auto"
    param_dtype: jnp.dtype = jnp.float32
    dtype: Optional[jnp.dtype] = None  # compute dtype (bf16 halves SpMM traffic)

    @nn.compact
    def __call__(self, x: jax.Array, graph: Graph) -> jax.Array:
        x = nn.Dense(
            self.features,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.glorot_uniform(),
        )(x)
        # graphs prepared with normalize='gcn' carry the normalization in
        # their cached slot weights — the fast path; otherwise compute the
        # degree normalization in-graph per forward
        if self.normalize and graph.w_slots is None:
            w = gcn_edge_weight(graph, x.dtype)
        else:
            w = None
        out = ops.segment_spmm(graph, x, edge_weight=w, backend=self.backend)
        if self.use_bias:
            out = out + self.param(
                "bias", nn.initializers.zeros, (self.features,), self.param_dtype
            ).astype(out.dtype)
        return out


class SAGEConv(nn.Module):
    """GraphSAGE: out = W_l · mean_{j→i}(x_j) + W_r · x_i.

    Reference: `models/conv/sageconv.py:15-158` (`SAGEConv_GS`), aggregation
    via unweighted SpMM (`spmm_no_weight`, `models/conv/spmm.py:5-8`) with
    mean reduce. Graph should NOT include self-loops (root is handled by
    W_r).
    """

    features: int
    aggr: str = "mean"
    root_weight: bool = True
    normalize: bool = False
    use_bias: bool = True
    backend: str = "auto"
    param_dtype: jnp.dtype = jnp.float32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, graph: Graph) -> jax.Array:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        agg = ops.segment_spmm(graph, x, reduce=self.aggr, backend=self.backend)
        out = nn.Dense(
            self.features, use_bias=self.use_bias, dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(agg)
        if self.root_weight:
            out = out + nn.Dense(
                self.features, use_bias=False, dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(x)
        if self.normalize:
            out = out / jnp.maximum(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12
            )
        return out


class MLP(nn.Module):
    """Small MLP used inside GIN (reference `models/gin.py` builds
    Linear→ReLU→Linear for each GINConv)."""

    hidden: Sequence[int]
    act: Callable = nn.relu
    param_dtype: jnp.dtype = jnp.float32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        for i, h in enumerate(self.hidden):
            x = nn.Dense(h, dtype=self.dtype, param_dtype=self.param_dtype)(x)
            if i + 1 < len(self.hidden):
                x = self.act(x)
        return x


class GINConv(nn.Module):
    """GIN: out = MLP((1+eps) · x_i + sum_{j→i} x_j).

    Reference: `models/conv/ginconv.py:21-103` (`GINConv_GS`), sum aggregate
    via `spmm_no_weight`. Graph should NOT include self-loops.
    """

    features: int
    hidden: Optional[int] = None
    eps: float = 0.0
    train_eps: bool = False
    backend: str = "auto"
    param_dtype: jnp.dtype = jnp.float32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, graph: Graph) -> jax.Array:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        agg = ops.segment_spmm(graph, x, reduce="sum", backend=self.backend)
        if self.train_eps:
            eps = self.param(
                "eps", nn.initializers.constant(self.eps), (), self.param_dtype
            ).astype(x.dtype)
        else:
            eps = jnp.asarray(self.eps, x.dtype)
        h = self.hidden or self.features
        return MLP([h, self.features], param_dtype=self.param_dtype,
                   dtype=self.dtype)((1.0 + eps) * x + agg)


class GATConv(nn.Module):
    """Multi-head graph attention, aggregated with the multi-head SpMM.

    The attention pattern the reference's compiler pass rewrites into
    `geot.mh_spmm` (`geot/match_replace/fused_mh_spmm.py:4-50`; kernel
    `csrc/cuda/mh_spmm_kernel.cuh:28-213`): per-edge logits
    LeakyReLU(a_src·x_src + a_dst·x_dst), segment-softmax over each
    destination, then out[i] = Σ_j α_ij · x_j per head. Graph should
    include self-loops (PyG GATConv default add_self_loops=True).
    """

    features: int  # per-head output features
    heads: int = 1
    concat: bool = True
    negative_slope: float = 0.2
    use_bias: bool = True
    backend: str = "auto"
    param_dtype: jnp.dtype = jnp.float32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, graph: Graph) -> jax.Array:
        H, D = self.heads, self.features
        xh = nn.Dense(
            H * D,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.glorot_uniform(),
        )(x).reshape(-1, H, D)
        a_src = self.param(
            "att_src", nn.initializers.glorot_uniform(), (1, H, D), self.param_dtype
        ).astype(xh.dtype)
        a_dst = self.param(
            "att_dst", nn.initializers.glorot_uniform(), (1, H, D), self.param_dtype
        ).astype(xh.dtype)
        alpha_src = jnp.sum(xh * a_src, axis=-1)  # [nodes, H]
        alpha_dst = jnp.sum(xh * a_dst, axis=-1)
        # fused slot-space attention: logits/softmax/weights are produced
        # directly in the plan layout (no edge-order round trip)
        out = ops.gat_attention_spmm(
            graph, xh, alpha_src, alpha_dst,
            negative_slope=self.negative_slope, backend=self.backend,
        )  # [nodes, H, D]
        out = out.reshape(-1, H * D) if self.concat else out.mean(axis=1)
        if self.use_bias:
            dim = H * D if self.concat else D
            out = out + self.param(
                "bias", nn.initializers.zeros, (dim,), self.param_dtype
            ).astype(out.dtype)
        return out


class SGConv(nn.Module):
    """Simplified GCN: out = Â^K X W (reference compile-test model `sgc`,
    `test/compile/testmodels.py:3-25`). Graph must include self-loops."""

    features: int
    k: int = 2
    use_bias: bool = True
    backend: str = "auto"
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, graph: Graph) -> jax.Array:
        w = None if graph.w_slots is not None else gcn_edge_weight(graph, x.dtype)
        for _ in range(self.k):
            x = ops.segment_spmm(graph, x, edge_weight=w, backend=self.backend)
        return nn.Dense(
            self.features, use_bias=self.use_bias, param_dtype=self.param_dtype
        )(x)


class APPNPConv(nn.Module):
    """APPNP propagation: z^{k+1} = (1-α) Â z^k + α h (reference compile-test
    model `appnp`). Applies K propagation steps to already-transformed
    features. Graph must include self-loops."""

    k: int = 10
    alpha: float = 0.1
    backend: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array, graph: Graph) -> jax.Array:
        w = None if graph.w_slots is not None else gcn_edge_weight(graph, x.dtype)
        h = x
        for _ in range(self.k):
            x = (1.0 - self.alpha) * ops.segment_spmm(
                graph, x, edge_weight=w, backend=self.backend
            ) + self.alpha * h
        return x
