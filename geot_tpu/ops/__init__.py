from geot_tpu.ops.api import (
    index_scatter,
    gather_scatter,
    gather_weight_scatter,
    csr_gws,
    mh_spmm,
    mh_spmm_transposed,
    sddmm_coo,
    segment_softmax,
    segment_spmm,
    segment_counts,
    dispatch_path,
    gat_attention_spmm,
)
from geot_tpu.ops import reference

__all__ = [
    "index_scatter",
    "gather_scatter",
    "gather_weight_scatter",
    "csr_gws",
    "mh_spmm",
    "mh_spmm_transposed",
    "sddmm_coo",
    "segment_softmax",
    "segment_spmm",
    "dispatch_path",
    "gat_attention_spmm",
    "segment_counts",
    "reference",
]
