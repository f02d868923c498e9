"""Check pltpu.roll in interpret mode (CPU) — dynamic shift, both axes, >=128."""
import numpy as np, sys
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def k_sub(s_ref, x_ref, o_ref):
    o_ref[:] = pltpu.roll(x_ref[:], -s_ref[0], 0)[:256]

def k_lane(s_ref, x_ref, o_ref):
    o_ref[:] = pltpu.roll(x_ref[:], -s_ref[0], 1)[:, :256]

x = jnp.arange(512 * 128, dtype=jnp.float32).reshape(512, 128)
for shift in (0, 37, 200, 255):
    f = pl.pallas_call(
        k_sub,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec((512, 128), lambda t, s: (0, 0))],
            out_specs=pl.BlockSpec((256, 128), lambda t, s: (0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
        interpret=True,
    )
    out = f(jnp.array([shift], jnp.int32), x)
    ok = np.array_equal(np.asarray(out), np.roll(np.asarray(x), -shift, 0)[:256])
    print(f"sublane roll shift={shift}: {ok}")

xl = jnp.arange(512, dtype=jnp.float32).reshape(1, 512)
for shift in (0, 16, 240, 384):
    f = pl.pallas_call(
        k_lane,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec((1, 512), lambda t, s: (0, 0))],
            out_specs=pl.BlockSpec((1, 256), lambda t, s: (0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((1, 256), jnp.float32),
        interpret=True,
    )
    out = f(jnp.array([shift], jnp.int32), xl)
    ok = np.array_equal(np.asarray(out), np.roll(np.asarray(xl), -shift, 1)[:, :256])
    print(f"lane roll shift={shift}: {ok}")
print("jax", jax.__version__)
