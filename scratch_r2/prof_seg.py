import numpy as np, sys, cProfile, pstats
sys.path.insert(0, "/root/repo")
from geot_tpu.graph.plan import build_segment_plan_host
rng = np.random.default_rng(0)
nnz, n = 23_000_000, 232_965
dst = np.sort(rng.integers(0, n, nnz).astype(np.int32))
src = rng.integers(0, n, nnz).astype(np.int32)
cProfile.run("build_segment_plan_host(dst, src, n)", "/tmp/segprof")
p = pstats.Stats("/tmp/segprof"); p.sort_stats("cumtime").print_stats(15)
