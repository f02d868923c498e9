import numpy as np, sys, time
sys.path.insert(0, "/root/repo")
from geot_tpu.graph.datasets import synthetic_graph
t0=time.time(); d = synthetic_graph(2449029, 61859140, power=1.0, seed=0, name="products"); print(f"gen {time.time()-t0:.1f}s", flush=True)
from geot_tpu.graph.plan import build_segment_plan_host, build_bat_plan_host
order = np.argsort(d.dst, kind="stable"); src_s, dst_s = d.src[order], d.dst[order]
t0=time.time(); arrs, meta = build_segment_plan_host(dst_s, src_s, d.num_nodes); print(f"segplan {time.time()-t0:.1f}s T={len(arrs['out_block'])}", flush=True)
t0=time.time(); ab, mb = build_bat_plan_host(dst_s, d.num_nodes); print(f"batplan {time.time()-t0:.1f}s T={len(ab['out_block'])} chunks={len(mb['chunks'])}", flush=True)
