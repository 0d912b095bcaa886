"""Does per-compile xla_allow_excess_precision=false make the pure-XLA
path bit-equal to the Pallas engine ON CHIP?  And which side matches the
CPU-interpret truth?"""
import os, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_rt"))
import jax, numpy as np
import jax.numpy as jnp
from rust_raytrace_tpu.engine import Engine
from rust_raytrace_tpu.render import trace_rays, _camera_rays_device
from rust_raytrace_tpu.models import teapot

s, vp = teapot.build(resolution=(512, 288))
key = jax.random.PRNGKey(11)
o, d = _camera_rays_device(vp, key, 1)

def run_xla(copts):
    f = jax.jit(lambda st, o_, d_, k: trace_rays(
        st, o_, d_, k, maxdepth=vp.maxdepth, backend="xla",
        ray_chunk=1024, fixed_rng=True)[0])
    eng = Engine(s)           # for tensors
    if copts:
        fc = f.lower(eng.tensors, o, d, key).compile(compiler_options=copts)
        return np.asarray(fc(eng.tensors, o, d, key))
    return np.asarray(f(eng.tensors, o, d, key))

cx = run_xla(None)
try:
    cx_ne = run_xla({"xla_allow_excess_precision": "false"})
    dd = np.abs(cx - cx_ne).max()
    print(f"xla default vs xla no-excess: max diff {dd}", flush=True)
except Exception as e:
    print(f"no-excess compile FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
    cx_ne = None

ei = Engine(s).render(vp, key=key, fixed_rng=True, quantize=False).image
# colors from trace_rays are [R,3] in camera-ray order; engine image is [H,W,3]
# tile order differs — compare via the renderer instead for apples-to-apples:
from rust_raytrace_tpu.render import WavefrontRenderer
xi = WavefrontRenderer(s, backend="xla").render(vp, key=key, fixed_rng=True).image
print("engine vs xla(default): max", np.abs(ei - xi).max(), flush=True)
if cx_ne is not None:
    d01 = np.abs(cx - cx_ne).max()
    print("within-xla effect of the flag:", d01, flush=True)
