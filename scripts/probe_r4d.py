"""Round-3 probe R4D: re-sweep ncompact and page size under SAH pages.

The ncompact sweep last ran BEFORE the jnp.sort fix cut the per-boundary
cost, and before SAH cut per-wave traversal; the P sweep last ran before
SAH changed the pages/ray curve.  Both optima may have shifted.

Run: nohup python scripts/probe_r4d.py > /tmp/probe_r4d.log 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_rt"))

import numpy as np


def main():
    import jax

    from rust_raytrace_tpu.engine import Engine
    from rust_raytrace_tpu.models import multi, teapot
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

    tp = lambda: teapot.build(resolution="2k")
    mu = lambda: multi.build(resolution="2k")
    run("teapot_2k nc=2", tp, ncompact=2)
    run("teapot_2k nc=3", tp, ncompact=3)
    run("teapot_2k P=64", tp, page_size=64)
    run("teapot_2k P=72", tp, page_size=72)
    run("teapot_2k P=48", tp, page_size=48)
    run("multi_2k nc=3", mu, ncompact=3)
    run("multi_2k P=64", mu, page_size=64)
    run("multi_2k P=48", mu, page_size=48)


if __name__ == "__main__":
    main()
