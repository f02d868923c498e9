import sys; sys.path.insert(0, "/root/repo")
import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
x = jnp.asarray(np.random.rand(4096, 4096).astype(np.float32))
t0=time.time()
f = jax.jit(lambda a: jnp.tanh(a @ a.T).sum())
print(float(f(x)), f"compile+run {time.time()-t0:.2f}s")
