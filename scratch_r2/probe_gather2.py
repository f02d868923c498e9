"""Probe: Mosaic dynamic row-gather from a VMEM table via take_along_axis
with MATCHED shapes (tab [R,F], idx [R,F], out [R,F]); idx arrives as a
sublane vector [R,1] and broadcasts along lanes (cheap)."""
import numpy as np, sys, functools
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")
from geot_tpu.utils.timing import timeit

F = 128


def mk(R, n_rep, method):
    def kern(idx_ref, tab_ref, o_ref):
        tab = tab_ref[:]
        acc = jnp.zeros((R, F), jnp.float32)
        for r in range(n_rep):
            iv = idx_ref[:, r][:, None]  # [R,1] sublane vector
            if method == "taa":
                idxb = jnp.broadcast_to(iv, (R, F))
                g = jnp.take_along_axis(tab, idxb, axis=0)
            else:  # onehot with iota on the OTHER axis (no transpose)
                sel = (jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
                       == jnp.broadcast_to(iv, (R, R))).astype(jnp.bfloat16)
                g = jnp.dot(sel, tab.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            acc = acc + g
        o_ref[:] = acc

    return kern


def run(R, method, n_rep=8, interpret=False):
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal((R, F)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, R, (R, max(n_rep, 128))).astype(np.int32))
    f = pl.pallas_call(
        mk(R, n_rep, method),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, F), jnp.float32),
        interpret=interpret,
    )
    out = jax.jit(f)(idx, tab)
    expect = np.zeros((R, F), np.float32)
    hi = np.asarray(idx)
    for r in range(n_rep):
        expect += np.asarray(tab)[hi[:, r]]
    err = float(np.max(np.abs(np.asarray(out) - expect)))
    t = timeit(jax.jit(f), idx, tab, warmup=3, iters=50)
    per_row = t / (n_rep * R) * 1e9
    print(f"R={R:5d} {method:6s}: {t*1e6:8.2f} us  {per_row:6.1f} ns/row  err={err:.1e}",
          flush=True)


if __name__ == "__main__":
    interp = len(sys.argv) > 1 and sys.argv[1] == "cpu"
    for R in (512, 1024):
        for method in ("taa", "onehot"):
            try:
                run(R, method, interpret=interp)
            except Exception as ex:
                print(f"R={R} {method}: FAIL {str(ex)[:150]}", flush=True)
