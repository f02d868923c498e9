import faulthandler; faulthandler.dump_traceback_later(300, exit=True)
import numpy as np, jax, jax.numpy as jnp
from geot_tpu.graph.plan import build_bat_plan, packed_width
from geot_tpu.ops import api as ops
rng = np.random.default_rng(92)
nnz, n_seg, n_feat = 3003, 400, 16
idx = np.sort(rng.integers(0, n_seg, nnz)).astype(np.int32)
vals = jnp.asarray(rng.standard_normal((nnz, n_feat)).astype(np.float32))
nw = packed_width(n_feat)
bpc = build_bat_plan(idx, n_seg, e_tile=64, s_tile=64, km_pack=128//nw, max_chunk_tiles=7)
print("chunks", bpc.chunks[:3], "cb", bpc.chunk_blocks, "T", bpc.num_tiles, flush=True)
out_c = ops.index_scatter(vals, jnp.asarray(idx), n_seg, plan=bpc, backend="pallas")
expect = ops.index_scatter(vals, jnp.asarray(idx), n_seg, backend="reference")
d = np.abs(np.asarray(out_c) - np.asarray(expect))
bad = np.where(d.max(1) > 1e-3)[0]
print("bad segs", bad[:20], "tot", len(bad), flush=True)
print("windows of bad:", np.unique(bad // 64)[:10], flush=True)
# wide path on same chunked plan
n_feat2 = 100
vals2 = jnp.asarray(rng.standard_normal((nnz, n_feat2)).astype(np.float32))
bpc2 = build_bat_plan(idx, n_seg, e_tile=64, s_tile=64, max_chunk_tiles=7)
out2 = ops.index_scatter(vals2, jnp.asarray(idx), n_seg, plan=bpc2, backend="pallas")
exp2 = ops.index_scatter(vals2, jnp.asarray(idx), n_seg, backend="reference")
print("wide chunked err", float(jnp.max(jnp.abs(out2 - exp2))), flush=True)
