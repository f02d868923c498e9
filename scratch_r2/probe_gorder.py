"""Does gather index ORDER affect XLA row-gather speed? arxiv shapes."""
import numpy as np, sys
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from geot_tpu.graph.datasets import synthetic_graph
from geot_tpu.utils.timing import timeit

d = synthetic_graph(169343, 1166243, power=1.0, seed=0)
rng = np.random.default_rng(0)
n = d.num_nodes
order = np.argsort(d.dst, kind="stable")
src_s, dst_s = d.src[order], d.dst[order]
x = jnp.asarray(rng.standard_normal((n, 128)).astype(np.float32))
x16 = x.astype(jnp.bfloat16)

win = dst_s // 256
perm_ws = np.lexsort((src_s, win))  # window-major, src-sorted within
variants = {
    "edge(dst-sorted)": src_s,
    "window-src-sorted": src_s[perm_ws],
    "global-src-sorted": np.sort(src_s),
    "uniform-random": rng.integers(0, n, len(src_s)).astype(np.int32),
}
for tag, idx in variants.items():
    i = jnp.asarray(idx.astype(np.int32))
    f = jax.jit(lambda x, i: x[i])
    t = timeit(f, x, i, warmup=3, iters=20)
    t16 = timeit(f, x16, i, warmup=3, iters=20)
    print(f"{tag:18s}: f32 {t*1e3:7.3f} ms   bf16 {t16*1e3:7.3f} ms", flush=True)
