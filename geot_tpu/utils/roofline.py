"""Roofline model for segment-reduction ops on TPU.

Replaces the reference's effective-GFLOPS convention
(`benchmark/benchmark_cpp/include/codegen.py:10`: nnz*N/time/1e6) with an
HBM-bytes model, since these ops are bandwidth-bound: the BASELINE.md north
star is ≥80% of HBM roofline for Pallas SpMM.
"""

from __future__ import annotations

__all__ = [
    "spmm_bytes",
    "sddmm_bytes",
    "hbm_bandwidth_gbps",
    "roofline_fraction",
]

# Published peak HBM bandwidth per chip (GB/s).
_HBM_GBPS = {
    "v4": 1228.0,
    "v5e": 819.0,
    "v5 lite": 819.0,
    "v5p": 2765.0,
    "v6e": 1640.0,
}
_DEFAULT_GBPS = 819.0


def hbm_bandwidth_gbps(device=None) -> float:
    import jax

    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for k, v in _HBM_GBPS.items():
        if k in kind:
            return v
    return _DEFAULT_GBPS


def spmm_bytes(
    nnz: int,
    n_features: int,
    num_segments: int,
    num_src_nodes: int,
    dtype_bytes: int = 4,
    weighted: bool = True,
    fused_gather: bool = False,
) -> int:
    """Minimum HBM traffic for out[dst[e]] += w[e] * x[src[e]].

    The speed-of-light model reads every gathered row once, the index/weight
    streams once, and writes the output once. With the pre-gather
    implementation (gather materialized by XLA before the kernel) the edge
    values cross HBM twice more (write + re-read), which `fused_gather=False`
    accounts for — the honest denominator for the current implementation is
    still the speed-of-light number; use this only for diagnostics.
    """
    row_bytes = n_features * dtype_bytes
    traffic = nnz * row_bytes  # gathered rows (≥1 read of x per edge)
    if fused_gather is False:
        traffic += 2 * nnz * row_bytes  # materialized gather: write + re-read
    traffic += nnz * 4 * (2 if weighted else 1)  # indices (+ weights)
    traffic += num_segments * row_bytes  # output write
    return traffic


def sddmm_bytes(nnz: int, n_features: int, dtype_bytes: int = 4) -> int:
    """Minimum HBM traffic for out[e] = a[dst[e]] · b[src[e]] (COO SDDMM,
    reference convention `test/test_sddmm.py:30-47`): two gathered rows per
    edge, two index streams, one scalar write per edge."""
    return nnz * (2 * n_features * dtype_bytes + 2 * 4 + dtype_bytes)


def roofline_fraction(time_s: float, bytes_moved: int, device=None) -> float:
    bw = hbm_bandwidth_gbps(device) * 1e9
    return (bytes_moved / time_s) / bw
