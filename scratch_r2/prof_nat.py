import numpy as np, sys, time
sys.path.insert(0, "/root/repo")
from geot_tpu import native
from geot_tpu.graph.plan import build_segment_plan_host
rng = np.random.default_rng(0)
nnz, n = 23_000_000, 232_965
dst = np.sort(rng.integers(0, n, nnz).astype(np.int32))
src = rng.integers(0, n, nnz).astype(np.int32)
t0=time.time(); nat = native.build_plan_arrays(dst, src, n, 256, 256); print(f"native {time.time()-t0:.1f}s" if nat is not None else "native unavailable")
t0=time.time(); arrs, meta = build_segment_plan_host(dst, src, n, pack_align=1); print(f"full host build pack=1 {time.time()-t0:.1f}s")
