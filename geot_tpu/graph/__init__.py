from geot_tpu.graph.plan import (
    BatPlan,
    SegmentPlan,
    build_bat_plan,
    build_segment_plan,
    plan_tile_bounds,
)
from geot_tpu.graph.preprocess import (
    coo_to_csr,
    csr_to_coo,
    sort_edges_by_dst,
    add_self_loops,
    degree,
    gcn_norm,
)
from geot_tpu.graph.cache import cached_build, load_graph, save_graph
from geot_tpu.graph.reorder import (
    apply_order,
    degree_order,
    measure_window_dedup,
    rcm_order,
)
from geot_tpu.graph.structures import Graph, build_graph
from geot_tpu.graph.datasets import (
    GraphData,
    load_npz,
    synthetic_graph,
    synthetic_classification_graph,
    get_dataset,
    DATASET_SHAPES,
)

__all__ = [
    "BatPlan",
    "build_bat_plan",
    "SegmentPlan",
    "build_segment_plan",
    "plan_tile_bounds",
    "coo_to_csr",
    "csr_to_coo",
    "sort_edges_by_dst",
    "add_self_loops",
    "degree",
    "gcn_norm",
    "Graph",
    "build_graph",
    "rcm_order",
    "degree_order",
    "apply_order",
    "measure_window_dedup",
    "save_graph",
    "load_graph",
    "cached_build",
    "GraphData",
    "load_npz",
    "synthetic_graph",
    "synthetic_classification_graph",
    "get_dataset",
    "DATASET_SHAPES",
]
