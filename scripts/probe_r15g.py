"""Round-5 probe G: wave-0 shadow fusion A/B on teapot_2k_shadows.

Round 5 routes lights wave 0 through the fused per-lane kernel (trace +
feeler + shade in one kernel) instead of the unfused chain (union trace ->
rows round trip -> feeler cull + argsort + any_hit union kernel ->
standalone shade).  Same-process alternating A/B (the drift discipline,
PERF.md): both shapes, 3 reps, report every run.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_rt"))

from rust_raytrace_tpu.models import teapot
from rust_raytrace_tpu.engine import Engine
from rust_raytrace_tpu.utils.devbench import device_metric

sc, vp = teapot.build(resolution=(2560, 1440), with_light=True)
eng = Engine(sc)
for rep in range(3):
    for label, fused in (("fused-w0", True), ("unfused-w0", False)):
        runs = []
        mr, dt, rays = device_metric(eng, vp, ND=4, nruns=2, runs_out=runs,
                                     wave0_fused_lights=fused)
        print(f"rep{rep} {label}: best {mr:.3f} Mrays/s ({dt*1e3:.1f} ms) "
              f"runs {' '.join(f'{m:.2f}' for m, _ in runs)}", flush=True)
