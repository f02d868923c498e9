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

import os as _os

# Persistent XLA compilation cache: TPU compiles of the chunked large-graph
# programs take minutes (remote-compile tunnel); caching them across
# processes turns repeat benchmark/training launches into seconds. Opt out
# with GEOT_TPU_NO_COMPILE_CACHE=1 or by setting JAX_COMPILATION_CACHE_DIR.
if not _os.environ.get("GEOT_TPU_NO_COMPILE_CACHE") and not _os.environ.get(
    "JAX_COMPILATION_CACHE_DIR"
):
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.expanduser("~/.cache/geot_tpu/jax"),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

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
