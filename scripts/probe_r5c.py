"""Round-5 probe C: clean re-measure of the spp4 outlier + nc=2 variants.

probe_r5b measured teapot_sd_spp4 at 36.75 Mrays/s (was 56.4 in r4f) while
a pytest run shared the axon tunnel — re-measure serialized, and check
whether the small render prefers a different ncompact now.

Run: nohup python scripts/probe_r5c.py > /tmp/probe_r5c.log 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_rt"))


def main():
    import jax

    from rust_raytrace_tpu.engine import Engine
    from rust_raytrace_tpu.models import teapot
    from rust_raytrace_tpu.utils.devbench import device_metric

    print("device:", jax.devices()[0], flush=True)

    def run(name, build, spp=1, cb=None, **ekw):
        try:
            scene, vp = build()
            eng = Engine(scene, **ekw)
            note = (f"tris={len(scene.tris)} P={eng.page_size} "
                    f"NP={eng.pages.num_pages} ncompact={eng.ncompact}")
            mr, dt, rays = device_metric(eng, vp, spp=spp, cb=cb)
            per_ray = dt / rays * 1e9
            print(f"{name}: {mr:.2f} Mrays/s device ({dt*1e3:.1f} ms, "
                  f"{per_ray:.2f} ns/ray) [{note}]", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    spp4 = lambda: teapot.build(resolution=(640, 480), samples=4)
    run("teapot_sd_spp4 nc=1", spp4, spp=4, ncompact=1)
    run("teapot_sd_spp4 nc=2", spp4, spp=4, ncompact=2)
    run("teapot_2k_light nc=2", lambda: teapot.build(resolution="2k",
                                                     with_light=True),
        ncompact=2)


if __name__ == "__main__":
    main()
