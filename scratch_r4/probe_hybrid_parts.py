"""Time the hybrid parts (per stream family + rest) on the cached bench
graph to see where the round-4 627 ms at products-clustered goes."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from geot_tpu.graph.cache import cached_build
from geot_tpu.graph.datasets import DATASET_SHAPES, synthetic_clustered_graph
from geot_tpu.models.conv import prepare_graph
from geot_tpu.ops import api as ops
from geot_tpu.utils.timing import timeit

n_nodes, n_edges, _, _ = DATASET_SHAPES["ogbn-products"]
rng = np.random.default_rng(0)
w_host = rng.standard_normal(n_edges).astype(np.float32)


def build():
    d = synthetic_clustered_graph(
        n_nodes, n_edges, mixing=0.3, mean_community=2000, power=1.0,
        seed=0, name="ogbn-products-clustered")
    return prepare_graph(d.src, d.dst, n_nodes, add_self_loops=False,
                         edge_weight=w_host, layouts=("bat", "stream"))


g = cached_build("bench-ogbn-products-clustered-N128-bat-stream", build)
x = jnp.asarray(rng.standard_normal((n_nodes, 128)).astype(np.float32))
assert g.hyb is not None
fams = g.hyb.stream
for sp in fams:
    print(f"family E={sp.e_tile}: T={sp.num_tiles} edges={sp.num_edges} "
          f"fill={sp.num_edges/(sp.num_tiles*sp.e_tile):.2f} "
          f"chunks={len(sp.chunks)}", flush=True)
rest_edges = 0 if g.hyb.rest_src is None else g.hyb.rest_src.shape[0]
print("rest edges:", rest_edges, flush=True)

def robust(label, fn, *a, **k):
    for attempt in range(3):
        try:
            return timeit(fn, *a, **k)
        except Exception as e:
            print(f"# {label} attempt {attempt}: {type(e).__name__} {str(e)[:90]}",
                  flush=True)
            time.sleep(30)
    return None


# per family
for i, sp in enumerate(fams):
    f_i = jax.jit(lambda sp1, x: ops._stream_sum((sp1,), x))
    t_i = robust(f"famE{sp.e_tile}", f_i, sp, x, warmup=2, iters=8)
    slots = sp.num_tiles * sp.e_tile
    t_i and print(f"family E={sp.e_tile}: {t_i*1e3:.1f} ms  "
          f"{t_i/slots*1e9:.2f} ns/slot  {t_i/max(sp.num_edges,1)*1e9:.2f} ns/edge",
          flush=True)

# rest only
if g.hyb.rest is not None:
    f_r = jax.jit(
        lambda rest, rs, rw, x: ops._spmm_fwd_bat(rest, x, rs, rw))
    t_r = robust("rest", f_r, g.hyb.rest, g.hyb.rest_src, g.hyb.rest_w, x,
                 warmup=2, iters=8)
    t_r and print(f"rest (BAT+gather): {t_r*1e3:.1f} ms "
          f"({t_r/max(rest_edges,1)*1e9:.2f} ns/edge)", flush=True)
