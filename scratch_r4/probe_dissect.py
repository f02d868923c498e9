"""Round-4 probe: dissect the stream kernel's 3.4 ns/slot.

Per tile the kernel does (E=512, S=x_rows=256, W=s_tile=256, f=128):
  select: onehot[E,S] @ x[S,f]   -> 2 bf16 passes (hi/lo)  = 33.6 MFLOP x2
  reduce: onehot[W,E] @ vals[E,f]-> 2 bf16 passes (hi/lo)  = 33.6 MFLOP x2
Theoretical at 197 TFLOPs bf16: ~1.4 ns/slot. Measured 3.4. Where does the
rest go? Variants isolate: one-hot construction (VPU), each dot, the
weight multiply, precision passes, and an in-kernel jnp.take gather (does
Mosaic 0.9 lower it, and at what speed?).
"""
import functools
import os
import sys
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/geot_tpu/jax")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _onehot_dot(onehot, v, passes=2):
    if v.dtype != jnp.float32:
        return jnp.dot(onehot.astype(v.dtype), v, preferred_element_type=jnp.float32)
    oh = onehot.astype(jnp.bfloat16)
    hi = v.astype(jnp.bfloat16)
    if passes == 1:
        return jnp.dot(oh, hi, preferred_element_type=jnp.float32)
    lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.dot(oh, hi, preferred_element_type=jnp.float32) + jnp.dot(
        oh, lo, preferred_element_type=jnp.float32
    )


def make_packed_kernel(s_tile, x_rows, has_w):
    """One [1, 3, E] int32 operand carries (dst, srcl, w-bits) -> one DMA
    per tile instead of three."""
    def kern(ob_ref, sb_ref, pk_ref, x_ref, o_ref, acc_ref):
        t = pl.program_id(1)
        n_t = pl.num_programs(1)
        cur = ob_ref[t]
        first = jnp.logical_or(t == 0, ob_ref[jnp.maximum(t - 1, 0)] != cur)
        last = jnp.logical_or(t == n_t - 1, ob_ref[jnp.minimum(t + 1, n_t - 1)] != cur)
        srcl = pk_ref[0, 1, :]
        e_tile = srcl.shape[0]
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (e_tile, x_rows), 1)
        sel = (col_ids == srcl[:, None]).astype(jnp.float32)
        vals = _onehot_dot(sel, x_ref[:])
        if has_w:
            w = jax.lax.bitcast_convert_type(pk_ref[0, 2, :], jnp.float32)
            vals = vals * w[:, None]
        local = pk_ref[0, 0, :] - cur * s_tile
        seg_ids = jax.lax.broadcasted_iota(jnp.int32, (s_tile, e_tile), 0)
        onehot = (seg_ids == local[None, :]).astype(jnp.float32)
        part = _onehot_dot(onehot, vals)

        @pl.when(first)
        def _():
            acc_ref[:] = part

        @pl.when(jnp.logical_not(first))
        def _():
            acc_ref[:] = acc_ref[:] + part

        @pl.when(last)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    return kern


def make_kernel(variant, s_tile, x_rows, has_w):
    def kern(*refs):
        ob_ref, sb_ref = refs[0], refs[1]
        i = 2
        dst_ref = refs[i]; i += 1
        srcl_ref = refs[i]; i += 1
        w_ref = None
        if has_w:
            w_ref = refs[i]; i += 1
        x_ref = refs[i]; i += 1
        o_ref, acc_ref = refs[i], refs[i + 1]

        t = pl.program_id(1)
        n_t = pl.num_programs(1)
        cur = ob_ref[t]
        first = jnp.logical_or(t == 0, ob_ref[jnp.maximum(t - 1, 0)] != cur)
        last = jnp.logical_or(t == n_t - 1, ob_ref[jnp.minimum(t + 1, n_t - 1)] != cur)

        srcl = srcl_ref[0, 0, :]
        e_tile = srcl.shape[0]
        f = x_ref.shape[1]

        if variant == "noop":
            # pure per-tile overhead: touch inputs, skip all compute
            part = (x_ref[:s_tile] if x_rows >= s_tile else jnp.concatenate(
                [x_ref[:]] * (s_tile // x_rows), axis=0)).astype(jnp.float32)
            part = part + jnp.float32(srcl_ref[0, 0, 0] + dst_ref[0, 0, 0])
        elif variant == "reduce_only":
            # skip the src select: vals = tiled copy of the x block
            reps = e_tile // x_rows if e_tile >= x_rows else 1
            vals = jnp.concatenate([x_ref[:]] * reps, axis=0)[:e_tile].astype(jnp.float32)
        elif variant == "take":
            # in-kernel dynamic gather (does Mosaic lower it? how fast?)
            vals = jnp.take(x_ref[:], jnp.maximum(srcl, 0), axis=0).astype(jnp.float32)
        elif variant in ("take2", "take2red1", "take2red1u"):
            # take_along_axis row gather (Mosaic dynamic_gather semantics:
            # indices shaped like the output)
            srcl2 = srcl[:, None]  # int32 reshape (supported; bool is not)
            idx2 = jnp.broadcast_to(jnp.maximum(srcl2, 0), (e_tile, f))
            vals = jnp.take_along_axis(
                x_ref[:], idx2, axis=0
            ).astype(jnp.float32)
            # -1 pads must contribute nothing
            vals = jnp.where(srcl2 >= 0, vals, 0.0)
        else:
            col_ids = jax.lax.broadcasted_iota(jnp.int32, (e_tile, x_rows), 1)
            sel = (col_ids == srcl[:, None]).astype(jnp.float32)
            passes = 1 if variant in ("sel1", "both1") else 2
            vals = _onehot_dot(sel, x_ref[:], passes=passes)

        if w_ref is not None and variant != "noop":
            vals = vals * w_ref[0, 0, :][:, None]

        if variant == "noop":
            pass
        elif variant == "select_only":
            part = vals[:s_tile] if e_tile >= s_tile else jnp.concatenate(
                [vals] * (s_tile // e_tile), axis=0)
        else:
            local = dst_ref[0, 0, :] - cur * s_tile
            seg_ids = jax.lax.broadcasted_iota(jnp.int32, (s_tile, e_tile), 0)
            onehot = (seg_ids == local[None, :]).astype(jnp.float32)
            passes = 1 if variant in ("red1", "both1", "take2red1") else 2
            part = _onehot_dot(onehot, vals, passes=passes)

        @pl.when(first)
        def _():
            acc_ref[:] = part

        @pl.when(jnp.logical_not(first))
        def _():
            acc_ref[:] = acc_ref[:] + part

        @pl.when(last)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    return kern


def stream_call_packed(ob, sb, pk3, x, has_w, *, s_tile, n_blocks,
                       x_rows, f_tile=128):
    T = ob.shape[0]
    E = pk3.shape[2]
    f_pad = x.shape[1]
    n_f = f_pad // f_tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_f, T),
        in_specs=[
            pl.BlockSpec((1, 3, E), lambda f, t, ob, sb: (t, 0, 0)),
            pl.BlockSpec((x_rows, f_tile), lambda f, t, ob, sb: (sb[t], f)),
        ],
        out_specs=pl.BlockSpec((s_tile, f_tile), lambda f, t, ob, sb: (ob[t], f)),
        scratch_shapes=[pltpu.VMEM((s_tile, f_tile), jnp.float32)],
    )
    return pl.pallas_call(
        make_packed_kernel(s_tile, x_rows, has_w),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * s_tile, f_pad), x.dtype),
    )(ob, sb, pk3, x)


def run_packed(E, S, W, n=2_449_029, n_tiles=8192, dtype=jnp.float32, N=128):
    ob, sb, dst3, srcl3, w3 = build_full_tiles(n, n_tiles, E, W, S, weights=True)
    T = ob.shape[0]
    if w3.shape[0] != T:
        w3 = np.concatenate([w3, np.zeros((T - w3.shape[0], 1, E), np.float32)])
    pk3 = np.stack(
        [dst3[:, 0, :], srcl3[:, 0, :], w3[:, 0, :].view(np.int32)], axis=1
    )  # [T, 3, E] int32
    n_blocks = -(-n // W)
    n_xb = -(-n // S)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((n_xb * S, N)).astype(np.float32), dtype=dtype)
    args = [jnp.asarray(a) for a in (ob, sb, pk3)]
    f = jax.jit(functools.partial(
        stream_call_packed, has_w=True, s_tile=W, n_blocks=n_blocks, x_rows=S))
    try:
        t = timeit(lambda: f(*args, x))
    except Exception as e:
        print(f"packed       E={E:5d} S={S:4d} W={W:4d}: FAILED {type(e).__name__}: {str(e)[:120]}")
        return None
    slots = n_tiles * E
    print(f"packed       E={E:5d} S={S:4d} W={W:4d} {jnp.dtype(dtype).name}: "
          f"{t*1e3:7.2f} ms  {t/slots*1e9:5.2f} ns/slot  ({n_tiles} tiles)")
    return t / slots * 1e9


def stream_call(variant, ob, sb, dst3, srcl3, x, w3=None, *, s_tile, n_blocks,
                x_rows, f_tile=128):
    T = ob.shape[0]
    E = dst3.shape[2]
    f_pad = x.shape[1]
    n_f = f_pad // f_tile
    in_specs = [
        pl.BlockSpec((1, 1, E), lambda f, t, ob, sb: (t, 0, 0)),
        pl.BlockSpec((1, 1, E), lambda f, t, ob, sb: (t, 0, 0)),
    ]
    operands = [dst3, srcl3]
    if w3 is not None:
        in_specs.append(pl.BlockSpec((1, 1, E), lambda f, t, ob, sb: (t, 0, 0)))
        operands.append(w3)
    if variant.endswith("_nodma"):
        # constant x block: isolates the per-tile DMA from the rest
        in_specs.append(pl.BlockSpec((x_rows, f_tile), lambda f, t, ob, sb: (0, f)))
    else:
        in_specs.append(pl.BlockSpec((x_rows, f_tile), lambda f, t, ob, sb: (sb[t], f)))
    operands.append(x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_f, T),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((s_tile, f_tile), lambda f, t, ob, sb: (ob[t], f)),
        scratch_shapes=[pltpu.VMEM((s_tile, f_tile), jnp.float32)],
    )
    return pl.pallas_call(
        make_kernel(variant.replace("_nodma", ""), s_tile, x_rows, w3 is not None),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * s_tile, f_pad), x.dtype),
    )(ob, sb, *operands)


def build_full_tiles(n, n_tiles, E, s_tile, x_rows, seed=0, weights=False):
    """T fully-filled tiles, each a random (window, block) cell."""
    rng = np.random.default_rng(seed)
    n_w = n // s_tile
    n_b = n // x_rows
    cw = np.sort(rng.integers(0, n_w, n_tiles))  # sorted windows (flush logic)
    cb = rng.integers(0, n_b, n_tiles)
    dst3 = (cw[:, None] * s_tile + rng.integers(0, s_tile, (n_tiles, E))).astype(np.int32)
    srcl3 = rng.integers(0, x_rows, (n_tiles, E)).astype(np.int32)
    # cover all windows
    missing = np.setdiff1d(np.arange(n_w, dtype=np.int32), cw.astype(np.int32))
    if len(missing):
        cw = np.concatenate([cw, missing])
        cb = np.concatenate([cb, np.zeros(len(missing), np.int32)])
        dst3 = np.concatenate([dst3, np.full((len(missing), E), -1, np.int32)])
        srcl3 = np.concatenate([srcl3, np.full((len(missing), E), -1, np.int32)])
        o2 = np.argsort(cw, kind="stable")
        cw, cb, dst3, srcl3 = cw[o2], cb[o2], dst3[o2], srcl3[o2]
    T = len(cw)
    w3 = None
    if weights:
        w3 = rng.standard_normal((T, 1, E)).astype(np.float32)
    return (cw.astype(np.int32), cb.astype(np.int32),
            dst3.reshape(T, 1, E), srcl3.reshape(T, 1, E), w3)


def fence(x):
    jax.device_get(x.reshape(-1)[:1])


def timeit(fn, warmup=3, iters=20):
    for _ in range(warmup):
        out = fn()
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    fence(out)
    return (time.perf_counter() - t0) / iters


def run(variant, E, S, W, n=2_449_029, n_tiles=8192, dtype=jnp.float32,
        weights=True, N=128):
    ob, sb, dst3, srcl3, w3 = build_full_tiles(n, n_tiles, E, W, S, weights=weights)
    n_blocks = -(-n // W)
    n_xb = -(-n // S)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((n_xb * S, N)).astype(np.float32), dtype=dtype)
    args = [jnp.asarray(a) for a in (ob, sb, dst3, srcl3)]
    w = None if w3 is None else jnp.asarray(w3)
    f = jax.jit(functools.partial(
        stream_call, variant, s_tile=W, n_blocks=n_blocks, x_rows=S))
    try:
        t = timeit(lambda: f(*args, x, w) if w is not None else f(*args, x))
    except Exception as e:
        print(f"{variant:12s} E={E:5d} S={S:4d} W={W:4d} {jnp.dtype(dtype).name}: FAILED {type(e).__name__}: {str(e)[:120]}")
        return None
    slots = n_tiles * E
    print(f"{variant:12s} E={E:5d} S={S:4d} W={W:4d} {jnp.dtype(dtype).name} w={weights}: "
          f"{t*1e3:7.2f} ms  {t/slots*1e9:5.2f} ns/slot  ({n_tiles} tiles)")
    return t / slots * 1e9


def check_take2():
    """take2 must agree with base (which agrees with segment_sum)."""
    outs = {}
    for v in ("base", "take2"):
        ob, sb, dst3, srcl3, w3 = build_full_tiles(
            4096, 64, 256, 256, 256, weights=True)
        # poke some -1 pads in
        dst3[::3, 0, ::5] = -1
        srcl3[::3, 0, ::5] = -1
        n_blocks = -(-4096 // 256)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((4096, 128)).astype(np.float32))
        outs[v] = stream_call(
            v, jnp.asarray(ob), jnp.asarray(sb), jnp.asarray(dst3),
            jnp.asarray(srcl3), x, jnp.asarray(w3),
            s_tile=256, n_blocks=n_blocks, x_rows=256)
    err = float(jnp.max(jnp.abs(outs["base"] - outs["take2"])))
    print(f"take2 vs base max abs err: {err:.3e}")


STAGES = {
    "dissect": lambda: [
        run(v, 512, 256, 256)
        for v in ("base", "select_only", "reduce_only", "sel1", "red1",
                  "both1", "take")
    ],
    "packed": lambda: [
        run_packed(512, 256, 256),
        run_packed(1024, 256, 256),
        run_packed(2048, 256, 256),
        run_packed(4096, 256, 256),
        run("base", 4096, 256, 256),
        run_packed(2048, 256, 512),
        run_packed(2048, 512, 256),
    ],
    "overhead": lambda: [
        run("noop", 512, 256, 256),
        run("noop_nodma", 512, 256, 256),
        run("base_nodma", 512, 256, 256),
        run("noop", 1024, 256, 256),
        run("noop", 2048, 256, 256),
        run("base", 256, 256, 256),
        run("noop", 256, 256, 256),
    ],
    "dissect2": lambda: [
        check_take2(),
        run("take2", 512, 256, 256),
        run("take2red1", 512, 256, 256),
        run("take2", 1024, 256, 256),
        run("take2red1", 1024, 256, 256),
        run("take2red1", 1024, 512, 256),
        run("take2red1", 2048, 512, 256),
        run("take2", 512, 256, 256, dtype=jnp.bfloat16),
    ],
    "extras": lambda: [
        run("base", 512, 256, 256, weights=False),
        run("base", 512, 256, 256, dtype=jnp.bfloat16),
        run("take", 512, 256, 256, dtype=jnp.bfloat16),
    ],
    "shapes_base": lambda: [
        run("base", e, s, w_)
        for (e, s, w_) in ((1024, 256, 256), (2048, 256, 256), (512, 128, 128),
                           (1024, 128, 128), (2048, 128, 128), (512, 512, 256),
                           (1024, 512, 256), (512, 256, 128), (1024, 256, 128),
                           (4096, 128, 128), (2048, 512, 512))
    ],
    "shapes_take": lambda: [
        run("take", e, s, w_)
        for (e, s, w_) in ((1024, 256, 256), (2048, 256, 256), (1024, 512, 512),
                           (2048, 512, 512), (4096, 512, 512), (2048, 1024, 512),
                           (4096, 1024, 1024))
    ],
}

if __name__ == "__main__":
    print(jax.devices())
    for stage in (sys.argv[1:] or list(STAGES)):
        print(f"--- stage {stage} ---", flush=True)
        STAGES[stage]()
