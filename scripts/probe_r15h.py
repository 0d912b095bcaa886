"""Round-5 probe H: BANK-MAJOR streamed bounce sweep on synthetic_1m.

probe_r15e (prefetch worklist): P=56 5.795 / P=112 6.757 / P=224 6.940
Mrays/s — the per-visit table DMA is hidden but the worklist's per-visit
fixed cost remains.  The bank-major sweep (trace_shade_bankmajor_pallas)
DMAs each bank's tables once per WAVE and streams 96 KB of ray/winner
rows per visit instead.  Same-process A/B at three page sizes, plus the
worklist kernel at the same sizes for the direct comparison.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_rt"))

import jax

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
for P in (224, 112, 56):
    eng = Engine(sc, page_size=P, auto_pages=False, streamed=True,
                 bank_major=True)
    NB = eng.slt_i.shape[0]
    runs = []
    mr, dt, rays = device_metric(eng, vp, ND=4, nruns=3,
                                 compiler_options=VMEM_OPT, runs_out=runs)
    print(f"bank-major P={P} NP={eng.pages.num_pages} NB={NB}: "
          f"{mr:.3f} Mrays/s ({dt*1e3:.1f} ms) runs "
          f"{' '.join(f'{m:.2f}' for m, _ in runs)}", flush=True)
