import sys; sys.path.insert(0, "/root/repo")
import cProfile, pstats, io, time
import numpy as np
from geot_tpu.graph.datasets import DATASET_SHAPES, synthetic_graph
from geot_tpu.models.conv import prepare_graph
n_nodes, n_edges, _, _ = DATASET_SHAPES["ogbn-products"]
d = synthetic_graph(n_nodes, n_edges, power=1.0, seed=0, name="ogbn-products")
print("gen done", flush=True)
rng = np.random.default_rng(0)
w = rng.standard_normal(d.num_edges).astype(np.float32)
pr = cProfile.Profile()
t0=time.time()
pr.enable()
g = prepare_graph(d.src, d.dst, n_nodes, add_self_loops=False, edge_weight=w, layouts=("bat",))
pr.disable()
print(f"build: {time.time()-t0:.1f}s", flush=True)
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
print(s.getvalue())
