"""geot_tpu — a TPU-native GNN message-passing framework.

Built from scratch around the capabilities of GeoT (fishmingyu/GeoT,
arXiv:2404.03019): efficient sorted-segment reduction for graph neural
network message passing. Where GeoT replaces atomic scatter with tiled
sorted-segment reduction CUDA kernels selected by offline decision trees,
this framework implements the same op surface as deterministic tiled
Pallas TPU kernels driven by a precomputed edge-tile execution plan
(`geot_tpu.graph.plan.SegmentPlan`), with JAX `custom_vjp` autograd, a
shape-driven tuning layer, flax model families (GCN/GIN/GraphSAGE/GAT),
and multi-chip scaling via `shard_map` edge partitioning.

Public op surface (parity with reference `geot/__init__.py:4-9,21`):
    index_scatter, gather_scatter, gather_weight_scatter, csr_gws,
    mh_spmm, mh_spmm_transposed, coo_to_csr, sddmm_coo
"""

from geot_tpu.ops import (
    index_scatter,
    gather_scatter,
    gather_weight_scatter,
    csr_gws,
    mh_spmm,
    mh_spmm_transposed,
    sddmm_coo,
    segment_spmm,
)
from geot_tpu.graph import (
    Graph,
    SegmentPlan,
    build_segment_plan,
    coo_to_csr,
    csr_to_coo,
    sort_edges_by_dst,
    add_self_loops,
    gcn_norm,
)

__version__ = "0.1.0"

__all__ = [
    "index_scatter",
    "gather_scatter",
    "gather_weight_scatter",
    "csr_gws",
    "mh_spmm",
    "mh_spmm_transposed",
    "sddmm_coo",
    "segment_spmm",
    "Graph",
    "SegmentPlan",
    "build_segment_plan",
    "coo_to_csr",
    "csr_to_coo",
    "sort_edges_by_dst",
    "add_self_loops",
    "gcn_norm",
]
