import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
a = np.random.default_rng(0).integers(0, 1<<30, 62_000_000).astype(np.int32)  # 248MB
t0=time.time(); d = jnp.asarray(a); d.block_until_ready(); t1=time.time()
print(f"h2d 248MB: {t1-t0:.2f}s -> {a.nbytes/ (t1-t0)/1e6:.0f} MB/s", flush=True)
t0=time.time(); p = np.argsort(a, kind="stable"); t1=time.time()
print(f"np.argsort 62M stable: {t1-t0:.2f}s", flush=True)
