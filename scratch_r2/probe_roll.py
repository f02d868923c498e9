"""R2 probe 2: dynamic pltpu.roll, wide-row gather crossover, concurrent gathers."""
import numpy as np, sys, functools
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from geot_tpu.utils.timing import timeit

print("device:", jax.devices()[0].device_kind)

# --- 1. dynamic roll on sublane axis inside a kernel ---
def roll_kernel(s_ref, x_ref, o_ref):
    sh = s_ref[0]
    o_ref[:] = pltpu.roll(x_ref[:], -sh, 0)[:128]

def try_roll():
    x = jnp.arange(256 * 128, dtype=jnp.float32).reshape(256, 128)
    sh = jnp.array([37], jnp.int32)
    f = pl.pallas_call(
        roll_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec((256, 128), lambda t, s: (0, 0))],
            out_specs=pl.BlockSpec((128, 128), lambda t, s: (0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
    )
    out = f(sh, x)
    expect = np.roll(np.asarray(x), -37, 0)[:128]
    print("dynamic roll works:", np.array_equal(np.asarray(out), expect))

try:
    try_roll()
except Exception as e:
    print("dynamic roll FAILED:", repr(e)[:300])

# --- 2. wide-row gather: where does row-bound become byte-bound? ---
rng = np.random.default_rng(0)
NNZ = 1166243
idx = jnp.asarray(rng.integers(0, 169343, size=NNZ, dtype=np.int32))
for n in (128, 256, 512, 1024):
    tab = jnp.asarray(rng.standard_normal((169343, n)).astype(np.float32))
    f = jax.jit(lambda t, i: t[i])
    t = timeit(f, tab, idx, warmup=3, iters=10)
    gb = NNZ * n * 4 / 1e9
    print(f"gather N={n:5d}: {t*1e3:8.3f} ms  read {gb/t:7.1f} GB/s  {t/NNZ*1e9:.2f} ns/row")

# --- 3. two concurrent half gathers vs one ---
tab = jnp.asarray(rng.standard_normal((169343, 128)).astype(np.float32))
h = NNZ // 2
f2 = jax.jit(lambda t, i: (t[i[:h]], t[i[h:]]))
t = timeit(f2, tab, idx, warmup=3, iters=10)
print(f"two half gathers: {t*1e3:.3f} ms")

# --- 4. gather with output dtype bf16 (cast fused?) ---
f3 = jax.jit(lambda t, i: t[i].astype(jnp.bfloat16))
t = timeit(f3, tab, idx, warmup=3, iters=10)
print(f"gather+cast bf16 out: {t*1e3:.3f} ms")

# --- 5. take_along / one_hot free check: dynamic-slice gather of BLOCKS ---
# (sanity: sequential read bandwidth of same volume)
big = jnp.asarray(rng.standard_normal((NNZ + 128, 128)).astype(np.float32))
f4 = jax.jit(lambda b: b[: NNZ] * 2.0)
t = timeit(f4, big, warmup=3, iters=10)
print(f"sequential read+write same volume: {t*1e3:.3f} ms ({2*NNZ*128*4/1e9/t:.0f} GB/s)")
