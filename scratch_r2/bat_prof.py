import sys; sys.path.insert(0, "/root/repo")
import cProfile, pstats, io, time
import numpy as np
rng = np.random.default_rng(0)
# products-shaped dst: zipf-ish sorted
n_nodes, nnz = 2_449_029, 61_859_140
ranks = np.arange(1, n_nodes + 1, dtype=np.float64)
probs = ranks ** -1.0
cdf = np.cumsum(probs); cdf /= cdf[-1]
dst = np.sort(np.searchsorted(cdf, rng.random(nnz)).astype(np.int32))
print("gen done", flush=True)
from geot_tpu.graph.plan import build_bat_plan_host
t0=time.time()
pr = cProfile.Profile(); pr.enable()
arrays, meta = build_bat_plan_host(dst, n_nodes, e_tile=1024, s_tile=256, km_pack=0, max_chunk_tiles=2048)
pr.disable()
print(f"build_bat_plan_host: {time.time()-t0:.1f}s", flush=True)
s = io.StringIO(); pstats.Stats(pr, stream=s).sort_stats("tottime").print_stats(12)
print(s.getvalue())
