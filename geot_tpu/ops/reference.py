"""Reference (pure-XLA) backend for every op.

These are the semantic oracles — the role `torch.sparse.mm` / `scatter_add_`
play in the reference tests (`test/test_index_scatter.py:5-23`,
`test/test_gather_scatter.py:4-27`) — and the fallback backend on platforms
or configurations the Pallas kernels don't cover (unsorted indices,
max/min/prod reductions). Everything is jit-compatible with static
`num_segments` (GeoT's runtime `index[-1]+1` sizing,
`csrc/index_scatter.cpp:15`, is not traceable on TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "segment_reduce_ref",
    "gather_scatter_ref",
    "gather_weight_scatter_ref",
    "mh_spmm_ref",
    "sddmm_coo_ref",
    "csr_spmm_ref",
]

_SEGMENT_FNS = {
    "sum": jax.ops.segment_sum,
    "mean": None,  # derived from sum
    "max": jax.ops.segment_max,
    "min": jax.ops.segment_min,
    "prod": jax.ops.segment_prod,
}

VALID_REDUCE = tuple(_SEGMENT_FNS)


def segment_reduce_ref(
    src: jax.Array,
    index: jax.Array,
    num_segments: int,
    reduce: str = "sum",
    indices_are_sorted: bool = True,
) -> jax.Array:
    """index_scatter semantics: out[index[i]] ⊕= src[i] along axis 0.

    Reference op: `geot/index_scatter.py:5-8` (reduce ∈ sum/mean/max/min/prod
    per `csrc/reducetype.h:3-29`; the CUDA kernels implement sum only).
    Max/min on empty segments yield 0 (matching zero-init scatter_reduce
    semantics rather than ±inf).
    """
    if reduce == "mean":
        s = jax.ops.segment_sum(
            src, index, num_segments, indices_are_sorted=indices_are_sorted
        )
        cnt = jax.ops.segment_sum(
            jnp.ones(index.shape, src.dtype),
            index,
            num_segments,
            indices_are_sorted=indices_are_sorted,
        )
        return s / jnp.maximum(cnt, 1).reshape((-1,) + (1,) * (src.ndim - 1))
    fn = _SEGMENT_FNS[reduce]
    out = fn(src, index, num_segments, indices_are_sorted=indices_are_sorted)
    if reduce in ("max", "min"):
        cnt = jax.ops.segment_sum(
            jnp.ones(index.shape, jnp.int32),
            index,
            num_segments,
            indices_are_sorted=indices_are_sorted,
        )
        empty = (cnt == 0).reshape((-1,) + (1,) * (src.ndim - 1))
        out = jnp.where(empty, jnp.zeros_like(out), out)
    return out


def gather_scatter_ref(
    src_index: jax.Array,
    dst_index: jax.Array,
    src: jax.Array,
    num_segments: int,
    reduce: str = "sum",
) -> jax.Array:
    """out[dst[e]] ⊕= src[src[e]] — unweighted fused SpMM
    (reference `geot/gather_scatter.py:7-24`)."""
    return segment_reduce_ref(src[src_index], dst_index, num_segments, reduce)


def gather_weight_scatter_ref(
    src_index: jax.Array,
    dst_index: jax.Array,
    weight: jax.Array,
    src: jax.Array,
    num_segments: int,
    reduce: str = "sum",
) -> jax.Array:
    """out[dst[e]] ⊕= weight[e] * src[src[e]]
    (reference `geot/gather_weight_scatter.py:4-18`)."""
    vals = src[src_index] * weight[:, None].astype(src.dtype)
    return segment_reduce_ref(vals, dst_index, num_segments, reduce)


def mh_spmm_ref(
    src_index: jax.Array,
    dst_index: jax.Array,
    weight: jax.Array,
    src: jax.Array,
    num_segments: int,
    reduce: str = "sum",
) -> jax.Array:
    """Multi-head SpMM: src [nodes, H, D], weight [nnz, H] →
    out[dst[e], h] ⊕= weight[e, h] * src[src[e], h]
    (reference `geot/mh_spmm.py:4-8`, kernel `csrc/cuda/mh_spmm_kernel.cuh`)."""
    vals = src[src_index] * weight[:, :, None].astype(src.dtype)
    return segment_reduce_ref(vals, dst_index, num_segments, reduce)


def sddmm_coo_ref(
    src_index: jax.Array,
    dst_index: jax.Array,
    a: jax.Array,
    b: jax.Array,
) -> jax.Array:
    """Per-edge dot product: out[e] = <a[dst[e]], b[src[e]]>
    (reference `sddmm_coo_impl`, `csrc/cuda/sddmm_coo_kernel.cuh:3-210`;
    used as the weight gradient of gather_weight_scatter,
    `geot/gather_weight_scatter.py:47`)."""
    return jnp.sum(a[dst_index] * b[src_index], axis=-1)


def csr_spmm_ref(
    indptr: jax.Array,
    col: jax.Array,
    weight: jax.Array,
    src: jax.Array,
) -> jax.Array:
    """CSR SpMM (csr_gws semantics, `geot/csr_gws.py:3-27`): rows from indptr."""
    from geot_tpu.graph.preprocess import csr_to_coo

    nnz = col.shape[0]
    row = csr_to_coo(indptr, nnz)
    return gather_weight_scatter_ref(
        col, row, weight, src, int(indptr.shape[0]) - 1
    )
