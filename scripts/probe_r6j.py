"""A/B cb=512 vs cb=1024 (upward never swept), alternating in one process."""
import os, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_rt"))
import jax
import rust_raytrace_tpu.engine as E
from rust_raytrace_tpu.models import teapot
from rust_raytrace_tpu.utils.devbench import device_metric

scene, vp = teapot.build(resolution="2k")
eng = E.Engine(scene)
eng.render(vp, key=jax.random.PRNGKey(7))
eng._auto_schedule = False
for rep in range(3):
    for cb in (512, 1024):
        mr, dt, rays = device_metric(eng, vp, cb=cb)
        print(f"rep{rep} cb={cb}: {mr:.2f} Mrays/s ({dt*1e3:.1f} ms)",
              flush=True)
