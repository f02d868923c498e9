import sys; sys.path.insert(0, "/root/repo")
import os
os.environ["JAX_PLATFORMS"]="cpu"
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms","cpu")
from geot_tpu.graph.plan import build_bat_plan
from geot_tpu.ops import api as ops

rng = np.random.default_rng(92)
nnz, n_seg = 3003, 400
idx = np.sort(rng.integers(0, n_seg, nnz)).astype(np.int32)
n_feat = 100
vals = jnp.asarray(rng.standard_normal((nnz, n_feat)).astype(np.float32))
bpc = build_bat_plan(idx, n_seg, e_tile=64, s_tile=64, max_chunk_tiles=7)
print("chunks:", bpc.chunks, "chunk_blocks:", bpc.chunk_blocks, "n_vblocks:", bpc.n_vblocks)
out_c = ops.index_scatter(vals, jnp.asarray(idx), n_seg, plan=bpc, backend="pallas")
expect = ops.index_scatter(vals, jnp.asarray(idx), n_seg, backend="reference")
d = np.abs(np.asarray(out_c) - np.asarray(expect))
print("max abs err:", d.max())
bad = np.argwhere(d > 1e-3)
print("bad rows:", sorted(set(bad[:,0].tolist()))[:20])
print("windows of bad rows:", sorted(set((bad[:,0]//64).tolist())))
