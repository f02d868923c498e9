import numpy as np, jax.numpy as jnp, jax
from geot_tpu.graph.plan import build_segment_plan
from geot_tpu.ops import api as ops
for n_feat, e_tile in [(4,64),(8,128),(32,64),(100,64)]:
    rng = np.random.default_rng(78)
    nnz, n_seg = 3000, 400
    idx = np.sort(rng.integers(0, n_seg, nnz)).astype(np.int32)
    vals = jnp.asarray(rng.standard_normal((nnz, n_feat)).astype(np.float32))
    plan = build_segment_plan(idx, None, n_seg, e_tile=e_tile, s_tile=64, max_chunk_slots=512)
    out = ops.index_scatter(vals, jnp.asarray(idx), n_seg, plan=plan, backend="pallas")
    expect = ops.index_scatter(vals, jnp.asarray(idx), n_seg, backend="reference")
    d = np.abs(np.asarray(out) - np.asarray(expect)).max()
    print(n_feat, e_tile, "maxerr", d, "packed_ok", ops._aeb_packed_ok(plan, n_feat), flush=True)
