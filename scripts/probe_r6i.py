"""A/B teapot byte-split vs src-gather sort permute, alternating in ONE
process to cancel the ~3 ms process-level drift."""
import functools, os, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_rt"))
import jax
import rust_raytrace_tpu.engine as E
from rust_raytrace_tpu.models import teapot
from rust_raytrace_tpu.utils.devbench import device_metric

orig = E.trace_shade_perlane_pallas
scene, vp = teapot.build(resolution="2k")
eng = E.Engine(scene)
eng.render(vp, key=jax.random.PRNGKey(7))   # plan schedule once

for rep in range(3):
    for mode, flag in [("bytes", False), ("gather", True)]:
        E.trace_shade_perlane_pallas = functools.partial(
            orig, permute_gather=flag)
        eng._auto_schedule = False
        mr, dt, rays = device_metric(eng, vp)
        print(f"rep{rep} {mode}: {mr:.2f} Mrays/s ({dt*1e3:.1f} ms)",
              flush=True)
