"""Round-4 probe G: page-size re-sweep for the multi-bank scenes UNDER SAH
(pre-SAH, multi P=112 lost to P=56; SAH cut multi's pages/ray 2.2x, so the
larger-page tradeoff — fewer banks + shorter loops vs more tris/step —
may have flipped), plus a circles ncompact check.

Run: nohup python scripts/probe_r4g.py > /tmp/probe_r4g.log 2>&1 &
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
    from rust_raytrace_tpu.models import circles, multi
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
    run("multi_2k P=112", mu, page_size=112)
    run("multi_2k P=168", mu, page_size=168)
    run("multi_2k P=80", mu, page_size=80)
    run("circles_2k nc=-1", lambda: circles.build(resolution="2k"),
        ncompact=-1)
    run("circles_2k nc=1", lambda: circles.build(resolution="2k"),
        ncompact=1)
    V = {"xla_tpu_scoped_vmem_limit_kib": "65536"}
    run("synthetic_100k P=112", synthetic_100k, copts=V, page_size=112)
    run("synthetic_100k P=224", synthetic_100k, copts=V, page_size=224)


if __name__ == "__main__":
    main()
