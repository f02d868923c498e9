"""Measure AEB paths on TPU: index_scatter + dynamic/static SpMM, arxiv shapes."""
import numpy as np, sys, functools
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from geot_tpu.graph.datasets import synthetic_graph
from geot_tpu.graph.plan import build_segment_plan
from geot_tpu.models.conv import prepare_graph
from geot_tpu.ops import api as ops
from geot_tpu.utils.timing import timeit

d = synthetic_graph(169343, 1166243, power=1.0, seed=0)
rng = np.random.default_rng(0)
n = d.num_nodes
order = np.argsort(d.dst, kind="stable")
src_s, dst_s = d.src[order], d.dst[order]
w_host = rng.standard_normal(d.num_edges).astype(np.float32)

print("== index_scatter (vals in edge order, no gather) ==", flush=True)
for N in (32, 128):
    vals = jnp.asarray(rng.standard_normal((d.num_edges, N)).astype(np.float32))
    idx = jnp.asarray(dst_s)
    plan = build_segment_plan(dst_s, None, n, e_tile=512, s_tile=256, feature_hint=N)
    f = jax.jit(functools.partial(
        lambda p, v, i: ops.index_scatter(v, i, n, plan=p, backend="pallas"), plan))
    t = timeit(f, vals, idx, warmup=3, iters=20)
    fx = jax.jit(lambda v, i: jax.ops.segment_sum(v, i, n, indices_are_sorted=True))
    tx = timeit(fx, vals, idx, warmup=3, iters=20)
    # correctness spot check
    err = float(jnp.max(jnp.abs(f(vals, idx) - fx(vals, idx))))
    print(f"N={N}: pallas {t*1e3:7.3f} ms  xla_segsum {tx*1e3:7.3f} ms  err {err:.2e}", flush=True)

print("== SpMM static vs dynamic weights, N=128 ==", flush=True)
g = prepare_graph(d.src, d.dst, n, add_self_loops=False, edge_weight=w_host)
x = jnp.asarray(rng.standard_normal((n, 128)).astype(np.float32))
w = jnp.asarray(w_host)
fs = jax.jit(lambda g, x: ops.segment_spmm(g, x, backend="pallas"))
t = timeit(fs, g, x, warmup=3, iters=20)
print(f"static  : {t*1e3:7.3f} ms", flush=True)
fd = jax.jit(lambda g, x, w: ops.segment_spmm(g, x, edge_weight=w, backend="pallas"))
t = timeit(fd, g, x, w, warmup=3, iters=20)
print(f"dynamic : {t*1e3:7.3f} ms", flush=True)
fx = jax.jit(lambda x, w: jax.ops.segment_sum(x[g.src] * w[:, None], g.dst, n, indices_are_sorted=True))
tx = timeit(fx, x, w, warmup=3, iters=20)
err = float(jnp.max(jnp.abs(fd(g, x, w) - fx(x, w))))
print(f"xla_seg : {tx*1e3:7.3f} ms  (dyn err {err:.2e})", flush=True)

print("== dynamic N=32 (packed AEB edge-gather) ==", flush=True)
x32 = jnp.asarray(rng.standard_normal((n, 32)).astype(np.float32))
g32 = prepare_graph(d.src, d.dst, n, add_self_loops=False, edge_weight=w_host, feature_hint=32)
t = timeit(fd, g32, x32, w, warmup=3, iters=20)
fx32 = jax.jit(lambda x, w: jax.ops.segment_sum(x[g32.src] * w[:, None], g32.dst, n, indices_are_sorted=True))
tx = timeit(fx32, x32, w, warmup=3, iters=20)
err = float(jnp.max(jnp.abs(fd(g32, x32, w) - fx32(x32, w))))
print(f"dynamic32: {t*1e3:7.3f} ms  xla {tx*1e3:7.3f} ms  err {err:.2e}", flush=True)
