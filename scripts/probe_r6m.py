"""Chip-level bit-exactness: production Engine (real Mosaic kernels) vs
WavefrontRenderer('xla') (pure XLA), fixed_rng, on the REAL TPU — the
hardware analog of tests/test_bitexact.py's CPU-interpret contract."""
import os, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_rt"))
import jax, numpy as np
from rust_raytrace_tpu.engine import Engine
from rust_raytrace_tpu.render import WavefrontRenderer
from rust_raytrace_tpu.models import teapot, circles
from rust_raytrace_tpu import math3d as m3
from rust_raytrace_tpu.camera import create_viewport
from rust_raytrace_tpu.geometry import make_sphere, make_triangles
from rust_raytrace_tpu.materials import matte, reflective
from rust_raytrace_tpu.scene import assemble

def random_scene(seed):
    rng = np.random.default_rng(seed)
    tris = []
    v0 = rng.uniform(-4, 4, (60, 3)) + [0, 0, 8]
    for k in range(60):
        a = v0[k]; b = a + rng.uniform(-1.5, 1.5, 3); c = a + rng.uniform(-1.5, 1.5, 3)
        mat = reflective(m3.make_color((200, 60, 60)), 0.3) if k % 3 == 0 \
            else matte(m3.make_color((60, 200, 120)), 0.25)
        tris.append(make_triangles([(tuple(a), tuple(b), tuple(c))], mat, 0.02))
    s = make_sphere((0.5, -0.5, 9.0), 1.5, (24, 24),
                    matte(m3.make_color((252, 119, 0)), 0.2), 0.0)
    scene = assemble(tris + [s])
    vp = create_viewport((256, 144), (1.6, 0.9), (0.0, 0.0, 0.0),
                         m3.unit(m3.vec(0.0, 0.0, 1.0)), 90.0, 0.0, 5, 1)
    return scene, vp

def check(name, scene, vp):
    key = jax.random.PRNGKey(11)
    ei = Engine(scene).render(vp, key=key, fixed_rng=True, quantize=False).image
    xi = WavefrontRenderer(scene, backend="xla").render(
        vp, key=key, fixed_rng=True).image
    d = np.abs(ei.astype(np.float64) - xi.astype(np.float64)).max()
    print(f"{name}: max|engine - xla| = {d} "
          f"({'BIT-EXACT' if d == 0.0 else 'MISMATCH'})", flush=True)

s, vp = teapot.build(resolution=(512, 288)); check("teapot_512x288", s, vp)
s, vp = circles.build(resolution=(256, 144)); check("circles_256x144", s, vp)
s, vp = random_scene(77); check("random77_256x144", s, vp)
