"""Probe: output-stationary streaming SpMM kernel (VERDICT r2 Next #1).

Design under test: edges sorted by (dst_window, src_block) cells; each tile
holds e_tile edges of ONE cell. The kernel keeps the dst-window accumulator
in VMEM (existing flush-once machinery), streams x blocks via a
scalar-prefetched per-tile src-block index, and selects rows with a src
one-hot matmul on the MXU — no HBM row gather anywhere.

Measures:
  A. correctness vs jax.ops.segment_sum (small random graph)
  B. ns/edge at full tile fill, sweeping (e_tile, x_rows) x {f32, bf16}
  C. fill sensitivity: edges-per-cell in {64, 256, 1024, 4096}
Compare against round-2 BAT floor: 3.65 ns/edge kernel + ~12 ns/row gather
at products scale (935 ms total / 61.9M edges = 15.1 ns/edge).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _onehot_dot(onehot, v):
    if v.dtype != jnp.float32:
        return jnp.dot(onehot.astype(v.dtype), v, preferred_element_type=jnp.float32)
    oh = onehot.astype(jnp.bfloat16)
    hi = v.astype(jnp.bfloat16)
    lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.dot(oh, hi, preferred_element_type=jnp.float32) + jnp.dot(
        oh, lo, preferred_element_type=jnp.float32
    )


def _stream_kernel(ob_ref, sb_ref, dst_ref, srcl_ref, x_ref, o_ref, acc_ref, *,
                   s_tile, x_rows):
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    cur = ob_ref[t]
    first = jnp.logical_or(t == 0, ob_ref[jnp.maximum(t - 1, 0)] != cur)
    last = jnp.logical_or(t == n_t - 1, ob_ref[jnp.minimum(t + 1, n_t - 1)] != cur)

    srcl = srcl_ref[0, 0, :]  # [E] block-local src ids, -1 on padding
    e_tile = srcl.shape[0]
    # select: vals[E, f] = onehot(srcl)[E, x_rows] @ x_block[x_rows, f]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (e_tile, x_rows), 1)
    sel = (col_ids == srcl[:, None]).astype(jnp.float32)
    vals = _onehot_dot(sel, x_ref[:])  # [E, f] f32
    local = dst_ref[0, 0, :] - cur * s_tile
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


def stream_segment_sum(ob, sb, dst3, srcl3, x, *, s_tile, n_blocks, x_rows,
                       f_tile=128, interpret=False):
    T = ob.shape[0]
    f_pad = x.shape[1]
    n_f = f_pad // f_tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_f, T),
        in_specs=[
            pl.BlockSpec((1, 1, dst3.shape[2]), lambda f, t, ob, sb: (t, 0, 0)),
            pl.BlockSpec((1, 1, dst3.shape[2]), lambda f, t, ob, sb: (t, 0, 0)),
            pl.BlockSpec((x_rows, f_tile), lambda f, t, ob, sb: (sb[t], f)),
        ],
        out_specs=pl.BlockSpec((s_tile, f_tile), lambda f, t, ob, sb: (ob[t], f)),
        scratch_shapes=[pltpu.VMEM((s_tile, f_tile), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_stream_kernel, s_tile=s_tile, x_rows=x_rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * s_tile, f_pad), x.dtype),
        interpret=interpret,
    )(ob, sb, dst3, srcl3, x)


def build_stream_tiles(dst, src, num_segments, num_src, e_tile, s_tile, x_rows):
    """Cell-sorted tiles. Returns (ob, sb, dst3, srcl3, stats)."""
    dst = np.asarray(dst, np.int64)
    src = np.asarray(src, np.int64)
    nnz = len(dst)
    n_blocks = -(-num_segments // s_tile)
    n_xb = -(-num_src // x_rows)
    w = dst // s_tile
    b = src // x_rows
    key = w * n_xb + b
    order = np.argsort(key, kind="stable")
    dst, src, key = dst[order], src[order], key[order]
    # run-compact cells
    head = np.empty(nnz, bool)
    head[0] = True
    np.not_equal(key[1:], key[:-1], out=head[1:])
    cell_start = np.nonzero(head)[0]
    cell_cnt = np.diff(np.concatenate([cell_start, [nnz]]))
    cell_key = key[cell_start]
    cell_w = cell_key // n_xb
    cell_b = cell_key % n_xb
    tiles_per_cell = -(-cell_cnt // e_tile)
    T = int(tiles_per_cell.sum())
    ob = np.repeat(cell_w, tiles_per_cell).astype(np.int32)
    sb = np.repeat(cell_b, tiles_per_cell).astype(np.int32)
    # slot layout
    tile_of_cell_start = np.zeros(len(cell_start) + 1, np.int64)
    np.cumsum(tiles_per_cell, out=tile_of_cell_start[1:])
    pos_in_cell = np.arange(nnz) - np.repeat(cell_start, cell_cnt)
    tile_idx = np.repeat(tile_of_cell_start[:-1], cell_cnt) + pos_in_cell // e_tile
    slot = tile_idx * e_tile + pos_in_cell % e_tile
    dst_slots = np.full(T * e_tile, -1, np.int32)
    srcl = np.full(T * e_tile, -1, np.int32)
    dst_slots[slot] = dst
    # src local id = src - sblock * x_rows
    srcl[slot] = (src % x_rows).astype(np.int32)
    # coverage for empty windows
    missing = np.setdiff1d(np.arange(n_blocks, dtype=np.int32), cell_w.astype(np.int32))
    if len(missing):
        ob = np.concatenate([ob, missing])
        sb = np.concatenate([sb, np.zeros(len(missing), np.int32)])
        dst_slots = np.concatenate([dst_slots, np.full(len(missing) * e_tile, -1, np.int32)])
        srcl = np.concatenate([srcl, np.full(len(missing) * e_tile, -1, np.int32)])
        o2 = np.argsort(ob, kind="stable")
        T2 = len(ob)
        dst_slots = dst_slots.reshape(T2, e_tile)[o2].reshape(-1)
        srcl = srcl.reshape(T2, e_tile)[o2].reshape(-1)
        ob, sb = ob[o2], sb[o2]
    T = len(ob)
    stats = dict(
        n_tiles=T, n_cells=len(cell_start),
        fill=nnz / (T * e_tile),
        mean_edges_per_cell=float(cell_cnt.mean()),
        x_fetches=int((np.diff(sb, prepend=-1) != 0).sum()),
    )
    return (ob.astype(np.int32), sb.astype(np.int32),
            dst_slots.reshape(T, 1, e_tile), srcl.reshape(T, 1, e_tile), stats)


def fence(x):
    jax.device_get(x.reshape(-1)[:1])


def timeit(fn, warmup=3, iters=10):
    out = None
    for _ in range(warmup):
        out = fn()
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    fence(out)
    return (time.perf_counter() - t0) / iters


def correctness():
    rng = np.random.default_rng(0)
    n_dst, n_src, nnz, N = 700, 900, 5000, 128
    dst = np.sort(rng.integers(0, n_dst, nnz))
    src = rng.integers(0, n_src, nnz)
    s_tile, e_tile, x_rows = 256, 256, 256
    ob, sb, dst3, srcl3, stats = build_stream_tiles(
        dst, src, n_dst, n_src, e_tile, s_tile, x_rows)
    n_blocks = -(-n_dst // s_tile)
    x = rng.standard_normal((n_src, N)).astype(np.float32)
    n_xb = -(-n_src // x_rows)
    x_pad = np.zeros((n_xb * x_rows, N), np.float32)
    x_pad[:n_src] = x
    out = stream_segment_sum(
        jnp.asarray(ob), jnp.asarray(sb), jnp.asarray(dst3), jnp.asarray(srcl3),
        jnp.asarray(x_pad), s_tile=s_tile, n_blocks=n_blocks, x_rows=x_rows)
    ref = jax.ops.segment_sum(x[src], jnp.asarray(dst), num_segments=n_blocks * s_tile)
    err = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f"correctness: rel err {err:.2e}  stats={stats}")
    assert err < 1e-5, err


def make_clustered(n, nnz, edges_per_cell, e_tile, s_tile, x_rows, seed=0):
    """Synthetic cell-concentrated graph: pick cells, fill each with
    `edges_per_cell` random (dst in window, src in block) edges."""
    rng = np.random.default_rng(seed)
    n_w = n // s_tile
    n_b = n // x_rows
    n_cells = nnz // edges_per_cell
    cw = rng.integers(0, n_w, n_cells)
    cb = rng.integers(0, n_b, n_cells)
    dst = (cw[:, None] * s_tile + rng.integers(0, s_tile, (n_cells, edges_per_cell))).reshape(-1)
    src = (cb[:, None] * x_rows + rng.integers(0, x_rows, (n_cells, edges_per_cell))).reshape(-1)
    order = np.argsort(dst, kind="stable")
    return dst[order], src[order]


def bench(n, nnz, epc, e_tile, s_tile, x_rows, N=128, dtype=jnp.float32):
    dst, src = make_clustered(n, nnz, epc, e_tile, s_tile, x_rows)
    ob, sb, dst3, srcl3, stats = build_stream_tiles(
        dst, src, n, n, e_tile, s_tile, x_rows)
    n_blocks = -(-n // s_tile)
    n_xb = -(-n // x_rows)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((n_xb * x_rows, N)).astype(np.float32)
    xj = jnp.asarray(x, dtype=dtype)
    args = (jnp.asarray(ob), jnp.asarray(sb), jnp.asarray(dst3),
            jnp.asarray(srcl3))
    f = jax.jit(functools.partial(
        stream_segment_sum, s_tile=s_tile, n_blocks=n_blocks, x_rows=x_rows))
    t = timeit(lambda: f(*args, xj))
    ns_edge = t / len(dst) * 1e9
    x_gb = stats["x_fetches"] * x_rows * N * xj.dtype.itemsize / 1e9
    print(f"n={n} nnz={len(dst)} epc={epc} E={e_tile} S={x_rows} W={s_tile} "
          f"{jnp.dtype(dtype).name}: {t*1e3:.2f} ms  {ns_edge:.2f} ns/edge  "
          f"tiles={stats['n_tiles']} fill={stats['fill']:.2f} "
          f"x_refetch={x_gb:.2f} GB ({x_gb/t:.0f} GB/s if serial)")
    return t


if __name__ == "__main__":
    print(jax.devices())
    correctness()
    # arxiv-scale sweep: 169k nodes, 1.2M edges
    n, nnz = 169_344, 1_200_000
    for epc in (1024, 256, 64):
        for (E, S, W) in ((256, 512, 512), (512, 512, 512), (256, 1024, 512),
                          (256, 512, 256)):
            bench(n, nnz, epc, E, W, S)
    # bf16
    bench(n, nnz, 1024, 256, 512, 512, dtype=jnp.bfloat16)
    bench(n, nnz, 256, 256, 512, 512, dtype=jnp.bfloat16)
