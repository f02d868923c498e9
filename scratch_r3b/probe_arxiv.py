import numpy as np, jax, jax.numpy as jnp
from geot_tpu.graph.datasets import DATASET_SHAPES, synthetic_graph
from geot_tpu.models.conv import prepare_graph
from geot_tpu.ops import api as ops
from geot_tpu.utils.timing import timeit

n_nodes, n_edges, _, _ = DATASET_SHAPES["ogbn-arxiv"]
d = synthetic_graph(n_nodes, n_edges, power=1.0, seed=0, name="ogbn-arxiv")
rng = np.random.default_rng(0)
w = rng.standard_normal(d.num_edges).astype(np.float32)
x = jnp.asarray(rng.standard_normal((n_nodes, 128)).astype(np.float32))
for layouts in [("bat",), ("bat","slot"), ("bat","slot","stream")]:
    g = prepare_graph(d.src, d.dst, n_nodes, add_self_loops=False,
                      edge_weight=w, layouts=layouts)
    fn = jax.jit(lambda g, x: ops.segment_spmm(g, x, backend="pallas"))
    t = timeit(fn, g, x, warmup=3, iters=50)
    print(layouts, f"{t*1e3:.3f} ms", "hybrid=" + str(getattr(g, "hybrid", None) is not None))
