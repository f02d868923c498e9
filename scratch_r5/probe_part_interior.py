"""Per-part interior reduce on the REAL chip: streamed (hybrid layout)
vs BAT (VERDICT r4 Next #5 'done' bar — measured interior-stream vs
interior-BAT per-part times + modeled scaling efficiency from the
measured halo volumes).

Builds the products-clustered 8-part partition twice (layout='hybrid' and
'bat'), then times ONE part's interior reduction each way on the single
real chip (shard_map needs 8 chips; the per-part kernels do not).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from geot_tpu.graph.datasets import DATASET_SHAPES, synthetic_clustered_graph
from geot_tpu.parallel.bat_partition import part_bat_reduce
from geot_tpu.parallel.partition import partition_graph
from geot_tpu.parallel.stream_partition import part_stream_reduce
from geot_tpu.utils.timing import timeit

n_nodes, n_edges, _, _ = DATASET_SHAPES["ogbn-products"]
d = synthetic_clustered_graph(
    n_nodes, n_edges, mixing=0.3, mean_community=2000, power=1.0, seed=0)
rng = np.random.default_rng(0)
w = rng.standard_normal(n_edges).astype(np.float32)
print("graph ready", flush=True)

t0 = time.time()
pg_h = partition_graph(d.src, d.dst, n_nodes, 8, edge_weight=w,
                       layout="hybrid")
print(f"hybrid partition: {time.time()-t0:.0f}s", flush=True)
t0 = time.time()
pg_b = partition_graph(d.src, d.dst, n_nodes, 8, edge_weight=w, layout="bat")
print(f"bat partition: {time.time()-t0:.0f}s", flush=True)

# measured halo volume (rows exchanged per part pair) for the scaling model
sm = np.asarray(pg_h.send_mask)
rows_pp = sm.sum(axis=2)  # [owner, dest]
print(f"halo slots H={pg_h.halo}; mean rows/pair={rows_pp.mean():.0f}; "
      f"max={rows_pp.max():.0f}; total exchanged rows={rows_pp.sum():.0f}",
      flush=True)

npp = pg_h.nodes_per_part
x_local = jnp.asarray(rng.standard_normal((npp, 128)).astype(np.float32))


def robust(label, fn, *a, iters=8):
    for attempt in range(3):
        try:
            return timeit(fn, *a, warmup=2, iters=iters)
        except Exception as e:
            print(f"# {label} attempt {attempt}: {type(e).__name__} "
                  f"{str(e)[:150]}", flush=True)
            time.sleep(20)
    return None


# hybrid: stream part + BAT residue for part 0
si = pg_h.stream_int.unbatch()
streamed0 = int(np.sum(np.asarray(si.srcl3) >= 0))
bi_h = pg_h.bat_int.unbatch()
rest0 = int(np.sum(np.asarray(bi_h.dst3) >= 0))
fn_s = jax.jit(lambda si, x: part_stream_reduce(si, x))
fn_bh = jax.jit(lambda bi, x: part_bat_reduce(bi, x))
t_s = robust("stream", fn_s, si, x_local)
t_bh = robust("bat_resid", fn_bh, bi_h, x_local)

# pure BAT: all interior edges of part 0
bi = pg_b.bat_int.unbatch()
int0 = int(np.sum(np.asarray(bi.dst3) >= 0))
t_b = robust("bat_all", fn_bh, bi, x_local)

if t_s and t_bh and t_b:
    print(f"part0 interior: streamed={streamed0} rest={rest0} all={int0}",
          flush=True)
    print(f"interior stream: {t_s*1e3:7.1f} ms ({t_s/max(streamed0,1)*1e9:.2f} ns/slot)",
          flush=True)
    print(f"interior rest (BAT): {t_bh*1e3:7.1f} ms", flush=True)
    print(f"interior hybrid total: {(t_s+t_bh)*1e3:7.1f} ms", flush=True)
    print(f"interior pure-BAT: {t_b*1e3:7.1f} ms "
          f"({(t_b/(t_s+t_bh)):.2f}x vs hybrid)", flush=True)
    # modeled scaling: per-part step = max(interior, boundary) + exchange.
    # ICI v5e ~ 400 GB/s/link aggregate; halo bytes per part:
    halo_bytes = float(rows_pp.sum(axis=0).max()) * 128 * 4
    t_ex = halo_bytes / 400e9
    print(f"modeled per-part halo exchange: {t_ex*1e3:.1f} ms "
          f"({halo_bytes/1e6:.0f} MB worst part)", flush=True)
