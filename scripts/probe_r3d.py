"""Round-3 probe D: (1) multi_2k with the bank-aware count sort;
(2) circles_2k ncompact sweep; (3) synthetic_100k with a raised scoped-vmem
limit; (4) multi page-size alternatives.

Run: nohup python scripts/probe_r3d.py > /tmp/probe_r3d.log 2>&1 &
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
    from rust_raytrace_tpu.models import circles, multi, teapot
    from rust_raytrace_tpu.utils.devbench import device_metric

    print("device:", jax.devices()[0], flush=True)
    BASE_NS = 19.38   # teapot_2k ns/ray from probe_r3c

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
                  f"{per_ray:.2f} ns/ray, {per_ray/BASE_NS:.2f}x vs "
                  f"teapot_2k) [{note}]", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    run("multi_2k banksort", lambda: multi.build(resolution="2k"))
    run("multi_2k banksort P=112",
        lambda: multi.build(resolution="2k"), page_size=112)
    run("circles_2k nc=-1", lambda: circles.build(resolution="2k"),
        ncompact=-1)
    run("circles_2k nc=2", lambda: circles.build(resolution="2k"),
        ncompact=2)
    run("synthetic_100k vmem64m", synthetic_100k,
        copts={"xla_tpu_scoped_vmem_limit_kib": "65536"})
    run("synthetic_100k rb512", synthetic_100k, bounce_chunk=512,
        copts={"xla_tpu_scoped_vmem_limit_kib": "65536"})
    run("teapot_2k check", lambda: teapot.build(resolution="2k"))


if __name__ == "__main__":
    main()
