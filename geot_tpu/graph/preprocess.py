"""Graph format preprocessing: sorting, CSR/COO conversion, normalization.

TPU-native analogue of GeoT's one-time format transforms: the Triton
COO→CSR histogram+cumsum (`geot/match_replace/format_transform.py:5-18`,
`geot/triton/coo_to_csr.py:13-26`) and the model-side adjacency prep
(`models/utils.py:15-55`: add self-loops, stack [col,row], sort by row).
All functions are pure jnp and jit-compatible given static sizes; they are
also cheap to run host-side via numpy inputs.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "coo_to_csr",
    "csr_to_coo",
    "sort_edges_by_dst",
    "add_self_loops",
    "degree",
    "gcn_norm",
]


def coo_to_csr(row: jax.Array, num_rows: int) -> jax.Array:
    """Row indices (need not be sorted) → CSR row pointer [num_rows+1], int32.

    Histogram + exclusive cumsum, mirroring `geot::coo_to_csr`
    (`geot/match_replace/format_transform.py:5-18`).
    """
    hist = jnp.zeros(num_rows, dtype=jnp.int32).at[row].add(1, mode="drop")
    return jnp.concatenate(
        [jnp.zeros(1, dtype=jnp.int32), jnp.cumsum(hist).astype(jnp.int32)]
    )


def csr_to_coo(indptr: jax.Array, nnz: int) -> jax.Array:
    """CSR row pointer → row index per nonzero (dst-sorted by construction)."""
    # row[e] = number of pointer values <= e, minus 1
    return (
        jnp.searchsorted(indptr, jnp.arange(nnz, dtype=indptr.dtype), side="right")
        - 1
    ).astype(jnp.int32)


def sort_edges_by_dst(
    src: jax.Array, dst: jax.Array, *edge_attrs: jax.Array
) -> Tuple[jax.Array, ...]:
    """Stable-sort edges by destination (the contract every fused op assumes;
    GeoT asserts the same sortedness at `models/utils.py:43-47`)."""
    perm = jnp.argsort(dst, stable=True)
    out = [src[perm], dst[perm]]
    out.extend(a[perm] for a in edge_attrs)
    return tuple(out)


def add_self_loops(
    src: jax.Array,
    dst: jax.Array,
    num_nodes: int,
    edge_weight: Optional[jax.Array] = None,
    fill_value: float = 1.0,
) -> Tuple[jax.Array, ...]:
    """Append (i, i) for every node (reference: `models/utils.py:30-31` uses
    torch_geometric.utils.add_self_loops). Result is NOT sorted."""
    loop = jnp.arange(num_nodes, dtype=src.dtype)
    src = jnp.concatenate([src, loop])
    dst = jnp.concatenate([dst, loop])
    if edge_weight is not None:
        w = jnp.concatenate(
            [edge_weight, jnp.full(num_nodes, fill_value, edge_weight.dtype)]
        )
        return src, dst, w
    return src, dst


def degree(index: jax.Array, num_nodes: int, dtype=jnp.float32) -> jax.Array:
    return jnp.zeros(num_nodes, dtype=dtype).at[index].add(1, mode="drop")


def gcn_norm(
    src: jax.Array,
    dst: jax.Array,
    num_nodes: int,
    edge_weight: Optional[jax.Array] = None,
    add_loops: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """GCN symmetric normalization: w_e ← d_dst^-1/2 · w_e · d_src^-1/2 with
    self-loops (reference: `models/conv/gcnconv.py:30-98` gcn_norm, sparse
    branch). Returns (src, dst, weight) — unsorted; sort before planning."""
    if edge_weight is None:
        edge_weight = jnp.ones(src.shape[0], dtype=jnp.float32)
    if add_loops:
        src, dst, edge_weight = add_self_loops(src, dst, num_nodes, edge_weight)
    deg = jnp.zeros(num_nodes, dtype=edge_weight.dtype).at[dst].add(edge_weight)
    dinv = jax.lax.rsqrt(jnp.maximum(deg, 1e-12))
    dinv = jnp.where(deg > 0, dinv, 0.0)
    return src, dst, dinv[dst] * edge_weight * dinv[src]
