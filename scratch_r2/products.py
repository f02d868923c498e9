"""Products-scale SpMM investigation: piece timings at N=100/128."""
import numpy as np, sys, time, functools
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from geot_tpu.graph.datasets import synthetic_graph
from geot_tpu.models.conv import prepare_graph
from geot_tpu.ops import api as ops
from geot_tpu.utils.timing import timeit

t0 = time.time()
d = synthetic_graph(2449029, 61859140, power=1.0, seed=0, name="products")
print(f"gen {time.time()-t0:.1f}s", flush=True)
rng = np.random.default_rng(0)
n = d.num_nodes
w_host = rng.standard_normal(d.num_edges).astype(np.float32)
t0 = time.time()
g = prepare_graph(d.src, d.dst, n, add_self_loops=False, edge_weight=w_host)
print(f"build {time.time()-t0:.1f}s chunks={len(g.plan.chunks)} T={g.plan.num_tiles} "
      f"e={g.plan.e_tile} s={g.plan.s_tile} chunk_blocks={g.plan.chunk_blocks}", flush=True)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100
x = jnp.asarray(rng.standard_normal((n, N)).astype(np.float32))

# gather-only baseline: one chunk's worth and full
srcs = g.plan.src_slots.reshape(-1)
fga = jax.jit(lambda x, s: x[s])
tg = timeit(fga, x, srcs, warmup=2, iters=5)
print(f"full slot gather [{srcs.shape[0]},{N}]: {tg*1e3:.1f} ms", flush=True)

fs = jax.jit(lambda g, x: ops.segment_spmm(g, x, backend="pallas"))
t = timeit(fs, g, x, warmup=2, iters=5)
print(f"static spmm N={N}: {t*1e3:.1f} ms  ({d.num_edges/t/1e6:.0f}M e/s)", flush=True)

fx = jax.jit(lambda x: jax.ops.segment_sum(
    x[g.src] * g.edge_weight[:, None], g.dst, n, indices_are_sorted=True))
tx = timeit(fx, x, warmup=2, iters=5)
print(f"xla segment_sum: {tx*1e3:.1f} ms", flush=True)
