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
g = prepare_graph(d.src, d.dst, n_nodes, add_self_loops=False,
                  edge_weight=w, layouts=("bat","slot","stream"))
print("hyb:", g.hyb is not None, "hyb_t:", g.hyb_t is not None)
if g.hyb is not None:
    for sp in g.hyb.stream:  # round-4: tuple of tile-size families
        print("stream plan:", {k: getattr(sp, k) for k in dir(sp) if not k.startswith('_') and isinstance(getattr(sp, k), (int, float))})
    print("rest:", g.hyb.rest is not None)
from geot_tpu.graph.stream_plan import build_stream_split_host
order = np.argsort(d.dst, kind="stable")
families, rest_mask, st = build_stream_split_host(  # round-4 API
    d.dst[order], d.src[order], n_nodes, n_nodes,
    edge_weight=w[order], feature_hint=128)
print("census:", st)
print("built:", families is not None, "rest frac:", rest_mask.mean() if rest_mask is not None else None)
