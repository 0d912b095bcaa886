"""Round-5 probe E: streamed regime WITH the guess-prefetch double buffer.

probe_r15d swept page size on the pre-prefetch kernel (P=224 best at
6.16 Mrays/s).  This measures the committed prefetch kernel at the same
page sizes, so the prefetch gain and the page-size choice are read off
one recorded run.  Also re-measures the per-visit cost on wave 0
(probe_r15b's decomposition) to see how much of the 2.5 us DMA floor the
prefetch actually hid.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_rt"))

import jax
import numpy as np

from rust_raytrace_tpu import math3d as m3
from rust_raytrace_tpu.camera import create_viewport
from rust_raytrace_tpu.engine import Engine
from rust_raytrace_tpu.geometry import make_sphere
from rust_raytrace_tpu.materials import matte
from rust_raytrace_tpu.scene import assemble
from rust_raytrace_tpu.utils.devbench import device_metric

VMEM_OPT = {"xla_tpu_scoped_vmem_limit_kib": "65536"}


def sphere_scene(nseg, maxdepth=5):
    s = make_sphere((0.0, 0.0, 10.0), 4.0, (nseg, nseg),
                    matte(m3.make_color((252, 119, 0)), 0.2), 0.0)
    vpc = create_viewport((2560, 1440), (1.6, 0.9), (0.0, 0.0, 0.0),
                          m3.unit(m3.vec(0.0, 0.0, 1.0)), 90.0, 0.0,
                          maxdepth, 1)
    return assemble([s]), vpc


sc, vp = sphere_scene(708)
for P in (56, 112, 224):
    eng = Engine(sc, page_size=P, auto_pages=False, streamed=True)
    NB = eng.slt_i.shape[0]
    runs = []
    mr, dt, rays = device_metric(eng, vp, ND=4, nruns=2,
                                 compiler_options=VMEM_OPT, runs_out=runs)
    print(f"prefetch P={P} NP={eng.pages.num_pages} NB={NB}: "
          f"{mr:.3f} Mrays/s ({dt*1e3:.1f} ms) runs "
          f"{' '.join(f'{m:.2f}' for m, _ in runs)}", flush=True)

# wave-0 unfused kernel per-visit cost with prefetch (vs 7.1 us serial)
import jax.numpy as jnp

from rust_raytrace_tpu.engine import _camera_rays_tiled, pick_tile
from rust_raytrace_tpu.ops.intersect_streamed import trace_streamed_pallas

eng = Engine(sc, page_size=56, auto_pages=False, streamed=True)
tw, th = pick_tile(vp.width, vp.height, 1024)
o3, d3, alive, _ = _camera_rays_tiled(vp, tw, th, spp=1)
R = o3.shape[1]
OT = jnp.asarray(np.asarray(o3), jnp.float32)
DT = jnp.asarray(np.asarray(d3), jnp.float32)
AL = jnp.asarray(np.asarray(alive))


@jax.jit
def tr(OT, DT, AL):
    out = trace_streamed_pallas(OT, DT, AL, eng.slt_i, eng.slt_s,
                                eng.s_ab, eng.s_bank_ab, 56, 1024)
    return out[:, :1]


x = jax.jit(tr, compiler_options=VMEM_OPT)(OT, DT, AL)
np.asarray(x)
for _ in range(2):
    t0 = time.perf_counter()
    x = tr(OT, DT, AL)
    np.asarray(x[:1, :1])
    dt = time.perf_counter() - t0
    print(f"wave0 unfused kernel w/ prefetch: {dt*1e3:.1f} ms "
          f"({dt/6280*1e6:.2f} us/visit vs serial 7.1)", flush=True)
