"""Round-4 probe: lane-dim dynamic_gather select for the stream kernel.

The dissection (scratch_r4/dissect.log) shows the one-hot CONSTRUCTION
(VPU iota+cmp+cast over [E,S] and [W,E]) dominates the stream kernel, not
the MXU dots. Mosaic's tpu.dynamic_gather won't lower along sublanes (dim
0 of [256,128] — remote-compile 500) but lane-dim gathers are the
supported mode. So: keep the x block TRANSPOSED [f, x_rows] in VMEM and
select source rows as k = x_rows/128 lane gathers + masked merges,
producing valsT [f, E] with no select one-hot at all. The dst reduce stays
an MXU one-hot dot (swap side: partT[f,W] = valsT @ onehotT[E,W]) into a
transposed accumulator; the final [f, segments] output is untransposed
once outside the kernel (XLA transpose, ~ms at products scale).
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/geot_tpu/jax")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def _onehot_dot_swap(v, onehot, passes=2):
    """v [f,E] f32 @ onehot [E,W] -> [f,W]."""
    if v.dtype != jnp.float32:
        return jnp.dot(v, onehot.astype(v.dtype), preferred_element_type=jnp.float32)
    oh = onehot.astype(jnp.bfloat16)
    hi = v.astype(jnp.bfloat16)
    if passes == 1:
        return jnp.dot(hi, oh, preferred_element_type=jnp.float32)
    lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.dot(hi, oh, preferred_element_type=jnp.float32) + jnp.dot(
        lo, oh, preferred_element_type=jnp.float32
    )


def make_kernel(s_tile, x_rows, has_w, passes=2):
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

        xT = x_ref[:]  # [f, x_rows]
        f = xT.shape[0]
        srcl = srcl_ref[0, 0, :]  # [E]
        e_tile = srcl.shape[0]
        srcl2 = srcl[None, :]  # [1, E] int32 (2D before any bool math)
        # Mosaic dynamic_gather wants data/idx/out all the SAME 2D shape and
        # gathers along lanes -> chunk edges into 128-wide groups and merge
        # x_rows/128 lane-group gathers per chunk. Sublane-broadcast of the
        # [1,E] index row is unsupported (vector.broadcast 1xN->fxN dies in
        # the backend), so replicate it via an MXU outer product instead:
        # idx values (< x_rows <= 2048) are exactly representable in f32.
        k = x_rows // 128
        nE = e_tile // 128
        ones_f = jnp.ones((f, 1), jnp.float32)
        idx_all = jnp.dot(
            ones_f, jnp.maximum(srcl2, 0).astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # DEFAULT=bf16 rounds idx>=256
        ).astype(jnp.int32)  # [f, E], every row = srcl
        parts = []
        for c in range(nE):
            idxb = idx_all[:, c * 128:(c + 1) * 128]  # [f, 128]
            acc_c = None
            for j in range(k):
                gj = jnp.take_along_axis(
                    xT[:, j * 128:(j + 1) * 128],
                    jnp.clip(idxb - j * 128, 0, 127),
                    axis=1,
                )
                if k == 1:
                    acc_c = gj
                else:
                    m = (idxb // 128) == j
                    acc_c = jnp.where(m, gj, 0.0 if acc_c is None else acc_c)
            parts.append(acc_c)
        valsT = parts[0] if nE == 1 else jnp.concatenate(parts, axis=1)
        valsT = jnp.where(srcl2 >= 0, valsT, 0.0).astype(jnp.float32)
        if w_ref is not None:
            valsT = valsT * w_ref[0, 0, :][None, :]

        local = dst_ref[0, 0, :] - cur * s_tile
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (e_tile, s_tile), 1)
        onehotT = (row_ids == local[:, None]).astype(jnp.float32)
        partT = _onehot_dot_swap(valsT, onehotT, passes=passes)

        @pl.when(first)
        def _():
            acc_ref[:] = partT

        @pl.when(jnp.logical_not(first))
        def _():
            acc_ref[:] = acc_ref[:] + partT

        @pl.when(last)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    return kern


def stream_call_T(ob, sb, dst3, srcl3, xT, w3=None, *, s_tile, n_blocks,
                  x_rows, f_tile=128, passes=2):
    T = ob.shape[0]
    E = dst3.shape[2]
    f_pad = xT.shape[0]
    n_f = f_pad // f_tile
    in_specs = [
        pl.BlockSpec((1, 1, E), lambda f, t, ob, sb: (t, 0, 0)),
        pl.BlockSpec((1, 1, E), lambda f, t, ob, sb: (t, 0, 0)),
    ]
    operands = [dst3, srcl3]
    if w3 is not None:
        in_specs.append(pl.BlockSpec((1, 1, E), lambda f, t, ob, sb: (t, 0, 0)))
        operands.append(w3)
    in_specs.append(pl.BlockSpec((f_tile, x_rows), lambda f, t, ob, sb: (f, sb[t])))
    operands.append(xT)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_f, T),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((f_tile, s_tile), lambda f, t, ob, sb: (f, ob[t])),
        scratch_shapes=[pltpu.VMEM((f_tile, s_tile), jnp.float32)],
    )
    return pl.pallas_call(
        make_kernel(s_tile, x_rows, w3 is not None, passes=passes),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((f_pad, n_blocks * s_tile), xT.dtype),
    )(ob, sb, *operands)


def build_full_tiles(n, n_tiles, E, s_tile, x_rows, seed=0, weights=False):
    rng = np.random.default_rng(seed)
    n_w = n // s_tile
    n_b = n // x_rows
    cw = np.sort(rng.integers(0, n_w, n_tiles))
    cb = rng.integers(0, n_b, n_tiles)
    dst3 = (cw[:, None] * s_tile + rng.integers(0, s_tile, (n_tiles, E))).astype(np.int32)
    srcl3 = rng.integers(0, x_rows, (n_tiles, E)).astype(np.int32)
    missing = np.setdiff1d(np.arange(n_w, dtype=np.int32), cw.astype(np.int32))
    if len(missing):
        cw = np.concatenate([cw, missing])
        cb = np.concatenate([cb, np.zeros(len(missing), np.int32)])
        dst3 = np.concatenate([dst3, np.full((len(missing), E), -1, np.int32)])
        srcl3 = np.concatenate([srcl3, np.full((len(missing), E), -1, np.int32)])
        o2 = np.argsort(cw, kind="stable")
        cw, cb, dst3, srcl3 = cw[o2], cb[o2], dst3[o2], srcl3[o2]
    T = len(cw)
    w3 = rng.standard_normal((T, 1, E)).astype(np.float32) if weights else None
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


def correctness(E=256, S=256, W=256):
    rng = np.random.default_rng(0)
    n = 4096
    ob, sb, dst3, srcl3, w3 = build_full_tiles(n, 64, E, W, S, weights=True)
    dst3[::3, 0, ::5] = -1
    srcl3[::3, 0, ::5] = -1
    w3[::3, 0, ::5] = 0.0
    n_blocks = -(-n // W)
    x = rng.standard_normal((n, 128)).astype(np.float32)
    xT = jnp.asarray(x.T.copy())
    outT = stream_call_T(
        jnp.asarray(ob), jnp.asarray(sb), jnp.asarray(dst3),
        jnp.asarray(srcl3), xT, jnp.asarray(w3),
        s_tile=W, n_blocks=n_blocks, x_rows=S)
    out = np.asarray(outT).T
    # reference
    ref = np.zeros((n_blocks * W, 128), np.float64)
    T = ob.shape[0]
    for t in range(T):
        for e in range(E):
            d, s_, wv = dst3[t, 0, e], srcl3[t, 0, e], w3[t, 0, e]
            if d >= 0 and s_ >= 0:
                ref[d] += wv * x[sb[t] * S + s_]
    err = np.max(np.abs(out - ref))
    print(f"takeT correctness (E={E},S={S},W={W}): max abs err {err:.3e}")
    assert err < 2e-2, err


def run(E, S, W, n=2_449_029, n_tiles=8192, dtype=jnp.float32, weights=True,
        N=128, passes=2):
    ob, sb, dst3, srcl3, w3 = build_full_tiles(n, n_tiles, E, W, S, weights=weights)
    n_blocks = -(-n // W)
    n_xb = -(-n // S)
    rng = np.random.default_rng(1)
    xT = jnp.asarray(
        rng.standard_normal((N, n_xb * S)).astype(np.float32), dtype=dtype)
    args = [jnp.asarray(a) for a in (ob, sb, dst3, srcl3)]
    w = None if w3 is None else jnp.asarray(w3)
    f = jax.jit(functools.partial(
        stream_call_T, s_tile=W, n_blocks=n_blocks, x_rows=S, passes=passes))
    try:
        t = timeit(lambda: f(*args, xT, w) if w is not None else f(*args, xT))
    except Exception as e:
        print(f"takeT E={E:5d} S={S:4d} W={W:4d} p{passes} {jnp.dtype(dtype).name}: "
              f"FAILED {type(e).__name__}: {str(e)[:150]}")
        return None
    slots = n_tiles * E
    print(f"takeT E={E:5d} S={S:4d} W={W:4d} p{passes} {jnp.dtype(dtype).name} "
          f"w={weights}: {t*1e3:7.2f} ms  {t/slots*1e9:5.2f} ns/slot "
          f"({n_tiles} tiles)")
    return t / slots * 1e9


STAGES = {
    "check": lambda: [correctness(), correctness(E=512, S=512, W=256)],
    "core": lambda: [
        run(512, 128, 128), run(512, 128, 256), run(512, 256, 256),
        run(1024, 256, 256), run(512, 512, 256), run(1024, 512, 256),
    ],
    "wide": lambda: [
        run(1024, 1024, 256), run(2048, 1024, 256), run(2048, 2048, 256),
        run(1024, 256, 512), run(2048, 512, 512), run(1024, 128, 128),
    ],
    "p1": lambda: [
        run(512, 256, 256, passes=1), run(1024, 512, 256, passes=1),
        run(512, 256, 256, dtype=jnp.bfloat16),
    ],
}

if __name__ == "__main__":
    print(jax.devices())
    for stage in (sys.argv[1:] or list(STAGES)):
        print(f"--- stage {stage} ---", flush=True)
        STAGES[stage]()
