"""Round-6 probe D: autotuned static boundary schedules on every config.

device_metric now runs one planning render first (wave decay ->
plan_boundaries -> static per-boundary schedule) — expect teapot to return
to its 105.8 ms optimum (the traced gate's ~4.7 ms program overhead gone),
synthetic to hold ~233 ms ({0,1,3} minus the useless b3), circles to plan
around its high keep-alive ratios.

Run: nohup python scripts/probe_r6d.py > /tmp/probe_r6d.log 2>&1 &
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_rt"))

VMEM_OPT = {"xla_tpu_scoped_vmem_limit_kib": "65536"}


def synthetic_100k():
    from rust_raytrace_tpu import math3d as m3
    from rust_raytrace_tpu.camera import create_viewport
    from rust_raytrace_tpu.geometry import make_sphere
    from rust_raytrace_tpu.materials import matte
    from rust_raytrace_tpu.scene import assemble

    s = make_sphere((0.0, 0.0, 10.0), 4.0, (224, 224),
                    matte(m3.make_color((252, 119, 0)), 0.2), 0.0)
    vp = create_viewport((2560, 1440), (1.6, 0.9), (0.0, 0.0, 0.0),
                         m3.unit(m3.vec(0.0, 0.0, 1.0)), 90.0, 0.0, 5, 1)
    return assemble([s]), vp


def main():
    import jax

    from rust_raytrace_tpu.engine import Engine
    from rust_raytrace_tpu.models import circles, multi, teapot
    from rust_raytrace_tpu.utils.devbench import device_metric

    print("device:", jax.devices()[0], flush=True)

    def run(name, build, spp=1, copts=None, **ekw):
        try:
            scene, vp = build()
            eng = Engine(scene, **ekw)
            mr, dt, rays = device_metric(eng, vp, spp=spp,
                                         compiler_options=copts)
            print(f"{name}: {mr:.2f} Mrays/s device ({dt*1e3:.1f} ms, "
                  f"{dt/rays*1e9:.2f} ns/ray) [schedule={eng.ncompact}]",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)

    run("teapot_2k auto", lambda: teapot.build(resolution="2k"))
    run("synthetic_100k auto", synthetic_100k, copts=VMEM_OPT)
    run("multi_2k auto", lambda: multi.build(resolution="2k"))
    run("circles_2k auto", lambda: circles.build(resolution="2k"))
    run("teapot_2k_light auto",
        lambda: teapot.build(resolution="2k", with_light=True))
    run("teapot_sd_spp4 auto",
        lambda: teapot.build(resolution=(640, 480), samples=4), spp=4)
    run("teapot_4k auto", lambda: teapot.build(resolution="4k"))


if __name__ == "__main__":
    main()
