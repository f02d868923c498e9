from geot_tpu.parallel.partition import PartitionedGraph, partition_graph
from geot_tpu.parallel.halo_spmm import (
    halo_spmm,
    node_sharding,
    block_nodes,
    unblock_nodes,
    pad_nodes,
)

__all__ = [
    "PartitionedGraph",
    "partition_graph",
    "halo_spmm",
    "node_sharding",
    "block_nodes",
    "unblock_nodes",
    "pad_nodes",
]
