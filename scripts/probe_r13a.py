"""~1M-triangle regime measurement (VERDICT r3 missing #1 / next #2).

Beyond 262,144 table slots the engine has no per-lane tables and bounce
waves ride the union kernel (now with chunk_live skipping + dynamic grid —
round-4 change).  This probe measures that regime on the real chip for the
first time, against the banked path's economics:

  synthetic_100k  (99.9k tris, banked per-lane, P=auto)   — the reference
  synthetic_250k  (250k tris, banked path at grown P)     — the cap's edge
  synthetic_1m    (1.0M tris, union-fallback bounces)     — the new regime

All lat/lon spheres (same geometry family as the bench's synthetic_100k),
2560x1440, maxdepth 5.  Reports device Mrays/s, per-ray cost ratios, wave
ray counts, and the engine's structural parameters (P, NP, banked or not).

Run: nohup python scripts/probe_r13a.py > /tmp/probe_r13a.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_rt"))

import numpy as np


def sphere_scene(nseg):
    from rust_raytrace_tpu import math3d as m3
    from rust_raytrace_tpu.camera import create_viewport
    from rust_raytrace_tpu.geometry import make_sphere
    from rust_raytrace_tpu.materials import matte
    from rust_raytrace_tpu.scene import assemble

    s = make_sphere((0.0, 0.0, 10.0), 4.0, (nseg, nseg),
                    matte(m3.make_color((252, 119, 0)), 0.2), 0.0)
    vpc = create_viewport((2560, 1440), (1.6, 0.9), (0.0, 0.0, 0.0),
                          m3.unit(m3.vec(0.0, 0.0, 1.0)), 90.0, 0.0, 5, 1)
    return assemble([s]), vpc


def main():
    import jax

    from rust_raytrace_tpu.engine import Engine
    from rust_raytrace_tpu.utils.devbench import device_metric

    print("device:", jax.devices()[0], flush=True)
    VMEM_OPT = {"xla_tpu_scoped_vmem_limit_kib": "65536"}

    out = {}
    for name, nseg in [("synthetic_100k", 224), ("synthetic_250k", 354),
                       ("synthetic_1m", 708)]:
        t0 = time.time()
        sc, vp = sphere_scene(nseg)
        ntris = len(sc.tris) - 1
        eng = Engine(sc)
        banked = eng.plt_i is not None
        NP = eng.pages.num_pages
        print(f"\n== {name}: {ntris} tris  P={eng.page_size} NP={NP} "
              f"banked={banked}  build {time.time() - t0:.1f}s ==",
              flush=True)
        t0 = time.time()
        try:
            mr, dt, rays = device_metric(eng, vp, ND=4, nruns=2,
                                         compiler_options=VMEM_OPT)
        except Exception as e:
            print(f"  FAILED: {type(e).__name__}: {e}", flush=True)
            out[name] = None
            continue
        ns_per_ray = dt / rays * 1e9
        print(f"  {mr:.2f} Mrays/s  {dt * 1e3:.1f} ms/render  rays {rays}"
              f"  {ns_per_ray:.2f} ns/ray  (compile+run {time.time() - t0:.0f}s)",
              flush=True)
        out[name] = (mr, dt, rays, ns_per_ray)

    if out.get("synthetic_100k") and out.get("synthetic_1m"):
        r = out["synthetic_1m"][3] / out["synthetic_100k"][3]
        print(f"\nper-ray cost 1m / 100k = {r:.2f}x  "
              f"(VERDICT r4 target: <= ~2x)", flush=True)
    print("RESULT", {k: (None if v is None else
                         {"mrays": round(v[0], 2),
                          "ns_per_ray": round(v[3], 2)})
                     for k, v in out.items()}, flush=True)


if __name__ == "__main__":
    main()
