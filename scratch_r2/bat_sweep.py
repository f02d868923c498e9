"""BAT kernel config sweep on arxiv shapes: (e_tile, s_tile) x dtype x
weighted, iscat (no gather) to isolate kernel cost; plus dyn-SpMM timing."""
import numpy as np, sys, functools
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from geot_tpu.graph.datasets import synthetic_graph
from geot_tpu.graph.plan import build_bat_plan
from geot_tpu.ops import api as ops
from geot_tpu.ops.pallas_segment import bat_segment_sum
from geot_tpu.utils.timing import timeit

d = synthetic_graph(169343, 1166243, power=1.0, seed=0)
rng = np.random.default_rng(0)
n = d.num_nodes
dst_s = np.sort(d.dst)
w = jnp.asarray(rng.standard_normal(d.num_edges).astype(np.float32))

N = 128
vals32 = jnp.asarray(rng.standard_normal((d.num_edges, N)).astype(np.float32))
vals16 = vals32.astype(jnp.bfloat16)

for e_tile in (512, 1024):
    for s_tile in (128, 256):
        bp = build_bat_plan(dst_s, n, e_tile=e_tile, s_tile=s_tile)
        for tag, vals, wgt in (
            ("f32", vals32, None),
            ("f32+w", vals32, w),
            ("bf16", vals16, None),
        ):
            f = jax.jit(functools.partial(
                lambda bp, v, we: bat_segment_sum(bp, v, we)[:n], bp))
            try:
                t = timeit(f, vals, wgt, warmup=3, iters=20)
                print(f"bat e={e_tile} s={s_tile} {tag}: T={bp.num_tiles} "
                      f"{t*1e3:7.3f} ms", flush=True)
            except Exception as ex:
                print(f"bat e={e_tile} s={s_tile} {tag}: FAIL {str(ex)[:120]}",
                      flush=True)
