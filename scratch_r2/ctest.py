import numpy as np, sys, time, functools
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from geot_tpu.graph.plan import build_segment_plan
from geot_tpu.ops import api as ops
# small graph, same kernel structure: does it compile fast?
rng = np.random.default_rng(0)
nnz, n_seg, N = 20000, 3000, 32
idx = np.sort(rng.integers(0, n_seg, nnz)).astype(np.int32)
vals = jnp.asarray(rng.standard_normal((nnz, N)).astype(np.float32))
plan = build_segment_plan(idx, None, n_seg, e_tile=512, s_tile=256, feature_hint=N)
t0 = time.time()
f = jax.jit(functools.partial(lambda p, v, i: ops.index_scatter(v, i, n_seg, plan=p, backend="pallas"), plan))
out = f(vals, jnp.asarray(idx))
out.block_until_ready()
print(f"compile+run small N=32: {time.time()-t0:.1f}s", flush=True)
exp = jax.ops.segment_sum(vals, jnp.asarray(idx), n_seg, indices_are_sorted=True)
print("err", float(jnp.max(jnp.abs(out - exp))), flush=True)
