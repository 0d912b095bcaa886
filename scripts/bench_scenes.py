"""Scene-scale sweep on chip: all BASELINE-config-like scenes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from rust_raytrace_tpu.engine import Engine
from rust_raytrace_tpu.models import REGISTRY


def main():
    print("device:", jax.devices()[0], flush=True)
    configs = [
        ("teapot", "2k", {}),
        ("teapot", "4k", {}),
        ("circles", "2k", {}),
        ("multi", "2k", {}),
        ("teapot", "sd", {"samples": 4}),
        ("teapot", "2k", {"with_light": True}),
    ]
    for scene_name, res, kw in configs:
        try:
            scene, vp = REGISTRY[scene_name](resolution=res, **kw)
        except TypeError:
            print(f"{scene_name}/{res} {kw}: unsupported kwargs", flush=True)
            continue
        eng = Engine(scene)
        note = f"P={eng.page_size} NP={eng.pages.num_pages} " \
               f"perlane={'y' if eng.plt_i is not None else 'n'}"
        r = eng.render(vp, key=jax.random.PRNGKey(0))  # compile
        ts = []
        for i in range(2):
            t0 = time.perf_counter()
            r = eng.render(vp, key=jax.random.PRNGKey(1 + i))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(f"{scene_name}/{res} {kw or ''}: {r.rays_traced/dt/1e6:.2f} "
              f"Mrays/s wall ({dt:.3f}s, {r.rays_traced} rays, "
              f"tris={len(scene.tris)}, {note})", flush=True)


if __name__ == "__main__":
    main()
