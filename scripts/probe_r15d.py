"""Round-5 probe D: page-size sweep for the STREAMED regime at 1M tris.

probe_r15b's budget: synthetic_1m = 93 ms wave 0 + ~880 ms bounce waves,
and each bank visit costs ~7.1 us of which only 2.5 us is the DMA floor —
the kernel is per-visit-fixed-cost bound, not predicate bound.  Bigger
pages mean fewer banks (NB = NP/128), fewer visits per scattered chunk,
and the same total predicate flops (eff pages/ray halves as P doubles) —
the knob the resident regime swept long ago (P=112 optimal for the 100k
sphere) but the streamed regime shipped at the P=56 default.
"""
import os
import sys

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


def sphere_scene(nseg, maxdepth=5):
    s = make_sphere((0.0, 0.0, 10.0), 4.0, (nseg, nseg),
                    matte(m3.make_color((252, 119, 0)), 0.2), 0.0)
    vpc = create_viewport((2560, 1440), (1.6, 0.9), (0.0, 0.0, 0.0),
                          m3.unit(m3.vec(0.0, 0.0, 1.0)), 90.0, 0.0,
                          maxdepth, 1)
    return assemble([s]), vpc

VMEM_OPT = {"xla_tpu_scoped_vmem_limit_kib": "65536"}

sc, vp = sphere_scene(708)
for P in (112, 224, 448):
    eng = Engine(sc, page_size=P, auto_pages=False, streamed=True)
    NB = eng.slt_i.shape[0]
    runs = []
    mr, dt, rays = device_metric(eng, vp, ND=4, nruns=2,
                                 compiler_options=VMEM_OPT, runs_out=runs)
    print(f"P={P} NP={eng.pages.num_pages} NB={NB}: {mr:.3f} Mrays/s "
          f"({dt*1e3:.1f} ms) runs "
          f"{' '.join(f'{m:.2f}' for m, _ in runs)}", flush=True)
