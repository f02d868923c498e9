import faulthandler; faulthandler.dump_traceback_later(240, exit=True)
import jax

import numpy as np, jax.numpy as jnp
from geot_tpu.graph.plan import build_bat_plan, packed_width
from geot_tpu.ops import api as ops
rng = np.random.default_rng(92)
nnz, n_seg, n_feat = 400, 64, 16
idx = np.sort(rng.integers(0, n_seg, nnz)).astype(np.int32)
vals = jnp.asarray(rng.standard_normal((nnz, n_feat)).astype(np.float32))
nw = packed_width(n_feat)
bpc = build_bat_plan(idx, n_seg, e_tile=64, s_tile=32, km_pack=128//nw, max_chunk_tiles=3)
print("chunks", bpc.chunks, "cb", bpc.chunk_blocks, "T", bpc.num_tiles, flush=True)
print("ob", np.asarray(bpc.out_block), flush=True)
print("vb", np.asarray(bpc.vblock), flush=True)
out_c = ops.index_scatter(vals, jnp.asarray(idx), n_seg, plan=bpc, backend="pallas")
expect = ops.index_scatter(vals, jnp.asarray(idx), n_seg, backend="reference")
d = np.abs(np.asarray(out_c) - np.asarray(expect))
bad = np.where(d.max(1) > 1e-3)[0]
print("bad segs", bad, flush=True)
bp1 = build_bat_plan(idx, n_seg, e_tile=64, s_tile=32, km_pack=128//nw)
out1 = ops.index_scatter(vals, jnp.asarray(idx), n_seg, plan=bp1, backend="pallas")
print("unchunked err", float(jnp.max(jnp.abs(out1 - expect))), flush=True)
