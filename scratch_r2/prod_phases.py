import sys; sys.path.insert(0, "/root/repo")
import time, os, sys
t0=time.time()
def mark(s): print(f"[{time.time()-t0:7.1f}s] {s}", flush=True)
import numpy as np
import jax, jax.numpy as jnp
from geot_tpu.graph.datasets import DATASET_SHAPES, synthetic_graph
from geot_tpu.models.conv import prepare_graph
from geot_tpu.ops import api as ops
from geot_tpu.utils.timing import timeit
mark("imports done")
n_nodes, n_edges, _, _ = DATASET_SHAPES["ogbn-products"]
d = synthetic_graph(n_nodes, n_edges, power=1.0, seed=0, name="ogbn-products")
mark(f"synthetic graph {n_edges} edges")
rng = np.random.default_rng(0)
w_host = rng.standard_normal(d.num_edges).astype(np.float32)
g = prepare_graph(d.src, d.dst, n_nodes, add_self_loops=False, edge_weight=w_host, layouts=("bat",))
mark("graph built (host)")
x = jnp.asarray(rng.standard_normal((n_nodes, 128)).astype(np.float32))
fn = jax.jit(lambda g, x: ops.segment_spmm(g, x, backend="pallas"))
out = fn(g, x); out.block_until_ready()
mark("first call (compile+transfer) done")
t = timeit(fn, g, x, warmup=2, iters=10)
mark(f"timed: {t*1e3:.2f} ms/call")
