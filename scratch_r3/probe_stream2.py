"""Probe 2: dimension sweep + per-tile overhead floor for the stream kernel."""
import sys
sys.path.insert(0, "/root/repo/scratch_r3")
from probe_stream import *  # noqa

if __name__ == "__main__":
    print(jax.devices())
    n, nnz = 169_344, 1_200_000
    for epc in (1024, 256):
        for (E, S, W) in ((512, 256, 256), (256, 256, 256), (1024, 512, 512),
                          (512, 512, 256), (512, 256, 512), (1024, 256, 256)):
            bench(n, nnz, epc, E, W, S)
    for (E, S, W) in ((512, 256, 256), (1024, 256, 256)):
        bench(n, nnz, 1024, E, W, S, dtype=jnp.bfloat16)
        bench(n, nnz, 256, E, W, S, dtype=jnp.bfloat16)
