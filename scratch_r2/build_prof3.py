import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
t0=time.time()
def mark(s): print(f"[{time.time()-t0:7.1f}s] {s}", flush=True)
from geot_tpu.graph.datasets import DATASET_SHAPES, synthetic_graph
n_nodes, n_edges, _, _ = DATASET_SHAPES["ogbn-products"]
d = synthetic_graph(n_nodes, n_edges, power=1.0, seed=0, name="ogbn-products")
mark("gen")
rng = np.random.default_rng(0)
w = rng.standard_normal(d.num_edges).astype(np.float32)
# manually step through build_graph internals
src = np.asarray(d.src, np.int32); dst = np.asarray(d.dst, np.int32)
order = np.argsort(dst, kind="stable")
mark("argsort dst")
src, dst, w2 = src[order], dst[order], w[order]
mark("apply perm")
from geot_tpu.graph.plan import build_bat_plan, packed_width
from geot_tpu.graph.structures import _stable_sort_perm
perm_t = _stable_sort_perm(src, n_nodes)
mark("stable sort perm (transpose)")
src_t = src[perm_t]
mark("apply perm_t")
bat = build_bat_plan(dst, n_nodes, e_tile=1024, s_tile=256, km_pack=0)
mark("build bat fwd")
bat_t = build_bat_plan(src_t, n_nodes, e_tile=1024, s_tile=256, km_pack=0)
mark("build bat t")
import jax.numpy as jnp
for nm, a in [("src",src),("dst",dst),("w",w2),("perm_t",perm_t),("dst_t",dst[perm_t])]:
    x = jnp.asarray(a); x.block_until_ready()
mark("device transfers")
