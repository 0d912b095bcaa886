"""Round-4 probe H: fill the auto-config grid cells probe_r4g left open.

probe_r4g (SAH pages) measured circles nc=1 at 55.7 Mrays/s vs the
adaptive default nc=2's 54.3 (probe_r4f) — the alpha>0.25 rule mis-sorts
circles under SAH.  Open cells before changing the rule:
  - multi_2k nc=1 (default nc=2 = 250.6 ms; if nc=1 matches, the rule
    collapses to "always 1")
  - synthetic_100k page-size shape between the measured P=56 (399 ms,
    14 banks) and P=112 (334.9 ms, 7 banks) and P=224 (366.3, 4 banks)

Run: nohup python scripts/probe_r4h.py > /tmp/probe_r4h.log 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_rt"))

import numpy as np


def synthetic_100k():
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
    from rust_raytrace_tpu.models import multi
    from rust_raytrace_tpu.utils.devbench import device_metric

    print("device:", jax.devices()[0], flush=True)

    def run(name, build, spp=1, copts=None, **ekw):
        try:
            scene, vp = build()
            eng = Engine(scene, **ekw)
            note = (f"tris={len(scene.tris)} P={eng.page_size} "
                    f"NP={eng.pages.num_pages} "
                    f"banks={(eng.pages.num_pages + 127) // 128} "
                    f"ncompact={eng.ncompact}")
            mr, dt, rays = device_metric(eng, vp, spp=spp,
                                         compiler_options=copts)
            per_ray = dt / rays * 1e9
            print(f"{name}: {mr:.2f} Mrays/s device ({dt*1e3:.1f} ms, "
                  f"{per_ray:.2f} ns/ray) [{note}]", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    mu = lambda: multi.build(resolution="2k")
    run("multi_2k nc=1", mu, ncompact=1)
    V = {"xla_tpu_scoped_vmem_limit_kib": "65536"}
    run("synthetic_100k P=96", synthetic_100k, copts=V, page_size=96)
    run("synthetic_100k P=128", synthetic_100k, copts=V, page_size=128)
    run("synthetic_100k P=144", synthetic_100k, copts=V, page_size=144)
    # rb re-sweep under SAH: shorter loops make per-chunk fixed costs
    # (slab + count sort + state IO) relatively bigger — larger chunks
    # amortize them better than the pre-SAH sweep (rb 2048 "equal or
    # worse") could show.
    from rust_raytrace_tpu.models import teapot
    tp = lambda: teapot.build(resolution="2k")
    run("teapot_2k rb=2048", tp, ray_chunk=2048)
    run("teapot_2k rb=1536", tp, ray_chunk=1536)


if __name__ == "__main__":
    main()
