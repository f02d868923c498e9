"""Post-fix rest-path measurement (baseline: 415 ms / ~19-22 ns/edge r4).
Builds the rest BatPlan fresh (chunk_vblocks now set) and times the
production executor `_spmm_fwd_bat` on the cached rest edge arrays, f32
and with a bf16 x table.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from geot_tpu.graph.plan import MAX_PREFETCH_TILES, build_bat_plan
from geot_tpu.ops import api as ops
from geot_tpu.utils.timing import timeit

HERE = os.path.dirname(os.path.abspath(__file__))
z = np.load(os.path.join(HERE, "rest_edges.npz"))
r_dst, r_src, r_w = z["r_dst"], z["r_src"], z["r_w"]
n_nodes = int(z["n_nodes"])
NR = len(r_dst)
print(f"rest edges={NR}", flush=True)

row_b = 128 * 4
for E in (1024, 512):
    budget = int(os.environ.get("GEOT_MAX_CHUNK_BYTES", 1 << 30))
    mct = max(min(MAX_PREFETCH_TILES, budget // (row_b * E)), 1)
    bp = build_bat_plan(r_dst, n_nodes, e_tile=E, s_tile=256,
                        max_chunk_tiles=mct)
    g_size = (bp.chunk_vblocks or 0) * E
    print(
        f"E={E}: tiles={bp.num_tiles} vblocks={bp.n_vblocks} "
        f"chunks={len(bp.chunks)} chunk_vblocks={bp.chunk_vblocks} "
        f"gather_rows/chunk={g_size + (512 if g_size % 1024 == 0 else 0)}",
        flush=True,
    )
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((n_nodes, 128)).astype(np.float32))
    sj = jnp.asarray(r_src)
    wj = jnp.asarray(r_w)
    fn = jax.jit(
        lambda bp, x, s, w: ops._spmm_fwd_bat(bp, x, s, w, token_gate=False)
    )
    import time
    for attempt in range(3):
        try:
            t = timeit(fn, bp, x, sj, wj, warmup=2, iters=8)
            break
        except Exception as e:
            print(f"# attempt {attempt}: {type(e).__name__} {str(e)[:150]}",
                  flush=True)
            time.sleep(20)
            t = None
    if t:
        print(f"rest E={E} f32: {t*1e3:7.1f} ms  {t/NR*1e9:5.2f} ns/edge",
              flush=True)
    # correctness spot check (200 random rows vs numpy oracle)
    out = np.asarray(fn(bp, x, sj, wj))
    rows = np.random.default_rng(2).integers(0, n_nodes, 200)
    xh = np.asarray(x, np.float64)
    ok = True
    for r in rows:
        sel = r_dst == r
        want = (xh[r_src[sel]] * r_w[sel][:, None]).sum(axis=0)
        got = out[r]
        if not np.allclose(got, want, rtol=1e-4, atol=1e-4):
            ok = False
            print(f"MISMATCH row {r}: {np.abs(got - want).max()}", flush=True)
            break
    print(f"E={E} correctness: {'OK' if ok else 'FAILED'}", flush=True)
