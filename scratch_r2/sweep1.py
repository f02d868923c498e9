"""Tile-shape sweep on TPU for index_scatter AEB + static/dynamic SpMM."""
import numpy as np, sys, functools, itertools
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from geot_tpu.graph.datasets import synthetic_graph
from geot_tpu.graph.plan import build_segment_plan
from geot_tpu.graph.structures import build_graph
from geot_tpu.ops import api as ops
from geot_tpu.utils.timing import timeit

d = synthetic_graph(169343, 1166243, power=1.0, seed=0)
rng = np.random.default_rng(0)
n = d.num_nodes
order = np.argsort(d.dst, kind="stable")
src_s, dst_s = d.src[order], d.dst[order]
w_host = rng.standard_normal(d.num_edges).astype(np.float32)

which = sys.argv[1] if len(sys.argv) > 1 else "iscat"

if which == "iscat":
    for N in (32, 128):
        vals = jnp.asarray(rng.standard_normal((d.num_edges, N)).astype(np.float32))
        idx = jnp.asarray(dst_s)
        for e_tile, s_tile in itertools.product((256, 512, 1024), (64, 128, 256)):
            if N == 32 and (e_tile * 32 // 128) // (128 // 32) < 8:
                pass
            try:
                plan = build_segment_plan(dst_s, None, n, e_tile=e_tile, s_tile=s_tile)
                f = jax.jit(functools.partial(
                    lambda p, v, i: ops.index_scatter(v, i, n, plan=p, backend="pallas"), plan))
                t = timeit(f, vals, idx, warmup=3, iters=20)
                print(f"iscat N={N} e={e_tile} s={s_tile}: {t*1e3:7.3f} ms", flush=True)
            except Exception as ex:
                print(f"iscat N={N} e={e_tile} s={s_tile}: FAIL {str(ex)[:80]}", flush=True)
else:
    x = jnp.asarray(rng.standard_normal((n, 128)).astype(np.float32))
    w = jnp.asarray(w_host)
    for e_tile, s_tile in itertools.product((256, 512, 1024), (64, 128, 256)):
        try:
            g = build_graph(d.src, d.dst, n, edge_weight=w_host, e_tile=e_tile, s_tile=s_tile)
            fs = jax.jit(lambda g, x: ops.segment_spmm(g, x, backend="pallas"))
            ts = timeit(fs, g, x, warmup=3, iters=20)
            fd = jax.jit(lambda g, x, w: ops.segment_spmm(g, x, edge_weight=w, backend="pallas"))
            td = timeit(fd, g, x, w, warmup=3, iters=20)
            print(f"spmm e={e_tile} s={s_tile}: static {ts*1e3:7.3f} dyn {td*1e3:7.3f} ms", flush=True)
        except Exception as ex:
            print(f"spmm e={e_tile} s={s_tile}: FAIL {str(ex)[:80]}", flush=True)
