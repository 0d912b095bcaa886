import os, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_rt"))
import jax
from rust_raytrace_tpu.engine import Engine
from rust_raytrace_tpu.models import teapot, multi
from rust_raytrace_tpu.utils.devbench import device_metric
scene, vp = teapot.build(resolution="2k")
eng = Engine(scene)
mr, dt, rays = device_metric(eng, vp)
print(f"teapot_2k hybrid: {mr:.2f} Mrays/s ({dt*1e3:.1f} ms)", flush=True)
scene, vp = multi.build(resolution="2k")
eng = Engine(scene)
mr, dt, rays = device_metric(eng, vp)
print(f"multi_2k hybrid: {mr:.2f} Mrays/s ({dt*1e3:.1f} ms)", flush=True)
