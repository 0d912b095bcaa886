"""Which side moved? engine-on-chip vs xla-on-CPU (the suite's truth)."""
import os, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_rt"))
import jax, numpy as np
from rust_raytrace_tpu.engine import Engine
from rust_raytrace_tpu.render import WavefrontRenderer
from rust_raytrace_tpu.models import teapot

s, vp = teapot.build(resolution=(512, 288))
key = jax.random.PRNGKey(11)
ei = Engine(s).render(vp, key=key, fixed_rng=True, quantize=False).image

cpu = jax.local_devices(backend="cpu")[0]
with jax.default_device(cpu):
    xc = WavefrontRenderer(s, backend="xla").render(
        vp, key=key, fixed_rng=True).image
d1 = np.abs(ei.astype(np.float64) - xc.astype(np.float64))
print(f"engine(chip) vs xla(cpu): differing {int((d1.max(axis=-1)>0).sum())} "
      f"pixels, max {d1.max()}", flush=True)

xi = WavefrontRenderer(s, backend="xla").render(vp, key=key, fixed_rng=True).image
d2 = np.abs(xi.astype(np.float64) - xc.astype(np.float64))
print(f"xla(chip) vs xla(cpu): differing {int((d2.max(axis=-1)>0).sum())} "
      f"pixels, max {d2.max()}", flush=True)
