"""Products-clustered 8-part HYBRID-layout dryrun (VERDICT r4 Next #5
"done" bar): build the full partition with streamed interior dense cells,
jit `halo_spmm` over an 8-device virtual CPU mesh, and execute one
forward + backward step on small features. Host-side build at full scale;
execution on tiny N keeps the CPU-mesh step tractable.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python scripts/dryrun_hybrid_products.py [--edges-scale 1.0]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from geot_tpu.graph.datasets import DATASET_SHAPES, synthetic_clustered_graph
from geot_tpu.parallel import (
    block_nodes,
    halo_spmm,
    node_sharding,
    partition_graph,
)

p = argparse.ArgumentParser()
p.add_argument("--build-scale", type=float, default=1.0,
               help="edge fraction for the full BUILD check (1.0 = 61.9M)")
p.add_argument("--exec-scale", type=float, default=0.01,
               help="edge fraction for the EXECUTED step — Pallas interpret "
               "mode on the CPU mesh runs grid steps in Python, so the "
               "executed graph must stay small")
p.add_argument("--features", type=int, default=8)
args = p.parse_args()

n_nodes_full, n_edges_full, _, _ = DATASET_SHAPES["ogbn-products"]


def make(scale):
    n_edges = int(n_edges_full * scale)
    n_nodes = n_nodes_full if scale >= 0.99 else max(int(n_nodes_full * scale), 8)
    t0 = time.time()
    d = synthetic_clustered_graph(
        n_nodes, n_edges, mixing=0.3, mean_community=2000, power=1.0, seed=0)
    rng = np.random.default_rng(0)
    w = rng.standard_normal(n_edges).astype(np.float32)
    print(f"graph generated ({time.time()-t0:.0f}s): {n_nodes} nodes, "
          f"{n_edges} edges", flush=True)
    t0 = time.time()
    pg = partition_graph(d.src, d.dst, n_nodes, 8, edge_weight=w,
                         layout="hybrid")
    print(f"8-part hybrid partition built in {time.time()-t0:.0f}s",
          flush=True)
    assert pg.stream_int is not None, "no part streamed (census rejected)"
    si = pg.stream_int
    streamed = int(np.sum(np.asarray(si.srcl3) >= 0))
    print(f"stream_int: E={si.e_tile} C={si.C} T_c={si.T_c} "
          f"streamed_slots={streamed}", flush=True)
    return d, w, pg, n_nodes


# 1. full-scale BUILD (the partition/stream builders at north-star size)
if args.build_scale > 0:
    make(args.build_scale)
    print("FULL-SCALE HYBRID PARTITION BUILD OK", flush=True)

# 2. executed step at a size interpret mode can run
d, w, pg, n_nodes = make(args.exec_scale)
rng = np.random.default_rng(0)

devs = jax.devices()
assert len(devs) >= 8, f"need 8 devices, have {len(devs)}"
mesh = Mesh(np.array(devs[:8]), ("parts",))
x = rng.standard_normal((n_nodes, args.features)).astype(np.float32)
xp = jax.device_put(block_nodes(jnp.asarray(x), pg), node_sharding(mesh))

t0 = time.time()
out = halo_spmm(xp, pg, mesh, backend="pallas")
out.block_until_ready()
print(f"forward step executed in {time.time()-t0:.0f}s "
      f"(out {out.shape})", flush=True)

cot = jax.device_put(
    jnp.asarray(rng.standard_normal(out.shape).astype(np.float32)),
    node_sharding(mesh),
)
t0 = time.time()
g = jax.grad(lambda xx: jnp.vdot(halo_spmm(xx, pg, mesh, backend="pallas"),
                                 cot))(xp)
g.block_until_ready()
print(f"backward step executed in {time.time()-t0:.0f}s", flush=True)
print("HYBRID 8-PART DRYRUN OK", flush=True)
