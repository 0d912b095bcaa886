"""Round-3 probe C: device metric for every BASELINE config with the new
kernels (banked per-lane pages, fused shadow feeler, ncompact=1, compacted
spp>1), plus a synthetic ~100k-triangle scene (scale-free check).

Run: nohup python scripts/probe_r3c.py > /tmp/probe_r3c.log 2>&1 &
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
    from rust_raytrace_tpu.models import circles, multi, teapot
    from rust_raytrace_tpu.utils.devbench import device_metric

    print("device:", jax.devices()[0], flush=True)

    configs = [
        ("teapot_2k", lambda: teapot.build(resolution="2k"), 1),
        ("multi_2k", lambda: multi.build(resolution="2k"), 1),
        ("teapot_2k_light",
         lambda: teapot.build(resolution="2k", with_light=True), 1),
        ("circles_2k", lambda: circles.build(resolution="2k"), 1),
        ("teapot_4k", lambda: teapot.build(resolution="4k"), 1),
        ("teapot_sd_spp4",
         lambda: teapot.build(resolution=(640, 480), samples=4), 4),
        ("synthetic_100k", synthetic_100k, 1),
    ]
    base_per_ray = None
    for name, build, spp in configs:
        try:
            scene, vp = build()
            eng = Engine(scene)
            note = (f"tris={len(scene.tris)} P={eng.page_size} "
                    f"NP={eng.pages.num_pages} "
                    f"banks={(eng.pages.num_pages + 127) // 128} "
                    f"perlane={'y' if eng.plt_i is not None else 'n'}")
            mr, dt, rays = device_metric(eng, vp, spp=spp)
            per_ray = dt / rays * 1e9
            rel = per_ray / base_per_ray if base_per_ray else 1.0
            if base_per_ray is None:
                base_per_ray = per_ray
            print(f"{name}: {mr:.2f} Mrays/s device ({dt*1e3:.1f} ms, "
                  f"{rays} rays, {per_ray:.2f} ns/ray, "
                  f"{rel:.2f}x vs teapot_2k) [{note}]", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
