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
    """Mean seconds per call of `fn(*args)` (jitted callables expected).

    Completion is forced with a device_get fence on a 1-element slice of
    each output leaf, NOT `block_until_ready`: on tunneled dev backends
    (axon) `block_until_ready` can return before queued work executes,
    silently reporting dispatch time. The fence costs ~1 RTT, amortized
    over `iters`.
    """
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fence(out)
    return (time.perf_counter() - t0) / iters


def _fence(out):
    import jax

    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "block_until_ready"):
            # 1-element dependent read: forces execution of everything the
            # leaf depends on (device programs run in submission order)
            jax.device_get(leaf.reshape(-1)[:1])
