"""python -m geot_tpu.native — build the native runtime library."""
from geot_tpu import native

if native.build(verbose=True):
    print(f"built OK; available={native.available()}")
else:
    raise SystemExit("native build failed")
