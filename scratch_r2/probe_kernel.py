"""Poor-man's profile of the packed2/sr2 kernels: disable pieces, time each.
Also probe in-kernel 2-D retile support."""
import numpy as np, sys, functools
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")
from geot_tpu.graph.datasets import synthetic_graph
from geot_tpu.graph.plan import build_segment_plan
from geot_tpu.ops import pallas_segment as ps
from geot_tpu.utils.timing import timeit

d = synthetic_graph(169343, 1166243, power=1.0, seed=0)
rng = np.random.default_rng(0)
n = d.num_nodes
dst_s = np.sort(d.dst)

# ---- probe: in-kernel retile [rows,128] -> [rows*4,32] ----
def retile_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:].reshape(512, 32)

try:
    x = jnp.arange(128 * 128, dtype=jnp.float32).reshape(128, 128)
    f = pl.pallas_call(
        retile_kernel,
        in_specs=[pl.BlockSpec((128, 128), lambda: (0, 0))],
        out_specs=pl.BlockSpec((512, 32), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((512, 32), jnp.float32),
    )
    out = f(x)
    ok = np.array_equal(np.asarray(out), np.asarray(x).reshape(512, 32))
    print("in-kernel retile [128,128]->[512,32]:", ok, flush=True)
except Exception as e:
    print("retile FAIL:", str(e)[:200], flush=True)

# ---- piece timing for packed2 on arxiv N=32 ----
E, S = 512, 128
plan = build_segment_plan(dst_s, None, n, e_tile=E, s_tile=S)
N = 32
vals = jnp.asarray(rng.standard_normal((d.num_edges, N)).astype(np.float32))
pack = 128 // N
rows = E // pack
T = plan.num_tiles
print(f"T={T} tiles", flush=True)

import geot_tpu.ops.pallas_segment as P

def variant_kernel(mode, ob_ref, e0_ref, dst_ref, wm_ref, vA_ref, vB_ref, o_ref, acc_ref):
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    cur = ob_ref[t]
    first = jnp.logical_or(t == 0, ob_ref[jnp.maximum(t - 1, 0)] != cur)
    last = jnp.logical_or(t == n_t - 1, ob_ref[jnp.minimum(t + 1, n_t - 1)] != cur)
    e0 = e0_ref[t]
    n_vblocks = (d.num_edges // E) + 2
    b0 = jnp.clip(e0 // E, 0, n_vblocks - 2)
    shift_rows = (e0 - b0 * E) // pack
    if mode == "noroll":
        v = vA_ref[:]
    else:
        v2 = jnp.concatenate([vA_ref[:], vB_ref[:]], axis=0)
        v = pltpu.roll(v2, -shift_rows, 0)[:rows]
    local = dst_ref[0, 0, :] - cur * S
    w_all = wm_ref[0, 0, :]
    part = jnp.zeros((S, N), jnp.float32)
    if mode == "nodots":
        part = part + jnp.sum(v, axis=0)[None, :N] * w_all[0]
    else:
        seg_ids = jax.lax.broadcasted_iota(jnp.int32, (S, rows), 0)
        for k in range(pack):
            lk = local[k * rows : (k + 1) * rows]
            wk = w_all[k * rows : (k + 1) * rows]
            if mode == "constoh":
                onehot = jnp.where(seg_ids < 1, 1.0, 0.0)
            else:
                onehot = (seg_ids == lk[None, :]).astype(jnp.float32)
            vk = v[:, k * N : (k + 1) * N] * wk[:, None].astype(v.dtype)
            if mode == "singledot":
                part = part + jnp.dot(
                    onehot.astype(jnp.bfloat16), vk.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
            else:
                part = part + P._onehot_dot(onehot, vk)
    @pl.when(first)
    def _():
        acc_ref[:] = part
    @pl.when(jnp.logical_not(first))
    def _():
        acc_ref[:] = acc_ref[:] + part
    @pl.when(last)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)

def run_variant(mode):
    target = -(-d.num_edges // E) * E
    vp = jnp.pad(vals, ((0, target - d.num_edges), (0, 0))).reshape(target // pack, 128)
    n_vblocks = target // E
    wm = ps._k_major(plan.mask, T, E, pack)
    dst_km = ps._k_major(plan.dst_slots, T, E, pack)
    b_clamp = n_vblocks - 2
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, E), lambda t, ob, e0: (t, 0, 0)),
            pl.BlockSpec((1, 1, E), lambda t, ob, e0: (t, 0, 0)),
            pl.BlockSpec((rows, 128), lambda t, ob, e0: (jnp.clip(e0[t] // E, 0, b_clamp), 0)),
            pl.BlockSpec((rows, 128), lambda t, ob, e0: (jnp.clip(e0[t] // E, 0, b_clamp) + 1, 0)),
        ],
        out_specs=pl.BlockSpec((S, N), lambda t, ob, e0: (ob[t], 0)),
        scratch_shapes=[pltpu.VMEM((S, N), jnp.float32)],
    )
    f = pl.pallas_call(
        functools.partial(variant_kernel, mode),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((plan.n_blocks * S, N), jnp.float32),
    )
    g = jax.jit(lambda ob, e0, a, b, c: f(ob, e0, a, b, c, c))
    t = timeit(g, plan.out_block, plan.e0, dst_km, wm, vp, warmup=3, iters=20)
    print(f"packed2[{mode}]: {t*1e3:7.3f} ms", flush=True)

for mode in ("full", "noroll", "nodots", "constoh", "singledot"):
    try:
        run_variant(mode)
    except Exception as e:
        print(f"{mode} FAIL: {str(e)[:150]}", flush=True)
