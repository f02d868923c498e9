"""Benchmark timing helpers.

TPU analogue of the reference's CUDA-event/wall-clock timers
(`csrc/util/gpuTimer.cuh`, `models/utils.py:57-72` timeit with warmup +
torch.cuda.synchronize): warmup iterations, then wall-clock around
`block_until_ready()`.
"""

from __future__ import annotations

import time
from typing import Callable

__all__ = ["timeit"]


def timeit(fn: Callable, *args, warmup: int = 10, iters: int = 100) -> float:
    """Mean seconds per call of `fn(*args)` (jitted callables expected)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _block(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _block(out)
    return (time.perf_counter() - t0) / iters


def _block(out):
    import jax

    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
