"""Round-3 probe R4B: on-chip effect of the page-aligned SAH KD splits
(pages.kd_order) measured by the offline probe_r4a to cut mean slab-hit
pages/ray 6.06 -> 2.77 on multi and 2.24 -> 2.14 on teapot, plus a
PAGES_PER_STEP 2/3/4 sweep on the scenes where steps shrank.

Run: nohup python scripts/probe_r4b.py > /tmp/probe_r4b.log 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_rt"))

import numpy as np


def synthetic_100k():
    """Dense sphere shell, ~100k triangles, teapot-like camera."""
    from rust_raytrace_tpu import math3d as m3
    from rust_raytrace_tpu.camera import create_viewport
    from rust_raytrace_tpu.geometry import make_sphere
    from rust_raytrace_tpu.materials import matte
    from rust_raytrace_tpu.scene import assemble

    s = make_sphere((0.0, 0.0, 10.0), 4.0, (224, 224),
                    matte(m3.make_color((252, 119, 0)), 0.2), 0.0)
    scene = assemble([s])
    vp = create_viewport((2560, 1440), (1.6, 0.9), (0.0, 0.0, 0.0),
                         m3.unit(m3.vec(0.0, 0.0, 1.0)), 90.0, 0.0, 5, 1)
    return scene, vp


def main():
    import jax

    from rust_raytrace_tpu.engine import Engine
    from rust_raytrace_tpu.models import multi, teapot
    from rust_raytrace_tpu.ops import intersect_perlane as ipl
    from rust_raytrace_tpu.utils.devbench import device_metric

    print("device:", jax.devices()[0], flush=True)
    BASE_NS = 19.38   # teapot_2k ns/ray from probe_r3c (median splits)

    def run(name, build, spp=1, copts=None, pps=None, **ekw):
        orig = ipl.PAGES_PER_STEP
        try:
            if pps is not None:
                ipl.PAGES_PER_STEP = pps
                ipl.trace_perlane_pallas.clear_cache()
            scene, vp = build()
            eng = Engine(scene, **ekw)
            note = (f"tris={len(scene.tris)} P={eng.page_size} "
                    f"NP={eng.pages.num_pages} "
                    f"banks={(eng.pages.num_pages + 127) // 128} "
                    f"ncompact={eng.ncompact} pps={ipl.PAGES_PER_STEP}")
            mr, dt, rays = device_metric(eng, vp, spp=spp,
                                         compiler_options=copts)
            per_ray = dt / rays * 1e9
            print(f"{name}: {mr:.2f} Mrays/s device ({dt*1e3:.1f} ms, "
                  f"{per_ray:.2f} ns/ray, {per_ray/BASE_NS:.2f}x vs "
                  f"teapot_2k-r3) [{note}]", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
        finally:
            if pps is not None:
                ipl.PAGES_PER_STEP = orig
                ipl.trace_perlane_pallas.clear_cache()

    run("teapot_2k sah", lambda: teapot.build(resolution="2k"))
    run("multi_2k sah", lambda: multi.build(resolution="2k"))
    run("synthetic_100k sah", synthetic_100k,
        copts={"xla_tpu_scoped_vmem_limit_kib": "65536"})
    run("teapot_2k sah pps3", lambda: teapot.build(resolution="2k"), pps=3)
    run("teapot_2k sah pps4", lambda: teapot.build(resolution="2k"), pps=4)
    run("multi_2k sah pps3", lambda: multi.build(resolution="2k"), pps=3)
    run("teapot_2k sah pps1", lambda: teapot.build(resolution="2k"), pps=1)


if __name__ == "__main__":
    main()
