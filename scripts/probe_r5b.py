"""Round-5 probe B: dynamic compact/expand grids + hoisted count-sort iotas.

After probe_r5a (dynamic bounce grids), compact_pallas/expand_pallas also
grew dynamic grids over the content prefix, and the per-lane kernels build
their [RB, RB] count-sort helpers once into persistent scratch instead of
per chunk.  Extra compaction boundaries now cost ~prefix-proportional, so
re-sweep ncompact; refresh all headline configs.

Run: nohup python scripts/probe_r5b.py > /tmp/probe_r5b.log 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_rt"))


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

    def run(name, build, spp=1, copts=None, cb=None, **ekw):
        try:
            scene, vp = build()
            eng = Engine(scene, **ekw)
            note = (f"tris={len(scene.tris)} P={eng.page_size} "
                    f"NP={eng.pages.num_pages} ncompact={eng.ncompact} "
                    f"cb={cb or 512}")
            mr, dt, rays = device_metric(eng, vp, spp=spp,
                                         compiler_options=copts, cb=cb)
            per_ray = dt / rays * 1e9
            print(f"{name}: {mr:.2f} Mrays/s device ({dt*1e3:.1f} ms, "
                  f"{per_ray:.2f} ns/ray) [{note}]", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    tp = lambda: teapot.build(resolution="2k")
    run("teapot_2k nc=2", tp, ncompact=2)
    run("teapot_2k nc=3", tp, ncompact=3)
    run("teapot_2k nc=all", tp, ncompact=-1)
    run("teapot_2k nc=1", tp, ncompact=1)
    run("multi_2k nc=2", lambda: multi.build(resolution="2k"), ncompact=2)
    run("multi_2k nc=3", lambda: multi.build(resolution="2k"), ncompact=3)
    run("circles_2k nc=1", lambda: circles.build(resolution="2k"),
        ncompact=1)
    run("circles_2k nc=2", lambda: circles.build(resolution="2k"),
        ncompact=2)
    run("synthetic_100k nc=2", synthetic_100k, ncompact=2,
        copts={"xla_tpu_scoped_vmem_limit_kib": "65536"})
    run("teapot_4k", lambda: teapot.build(resolution="4k"))
    run("teapot_sd_spp4",
        lambda: teapot.build(resolution=(640, 480), samples=4), spp=4)
    run("teapot_2k_light", lambda: teapot.build(resolution="2k",
                                                with_light=True))


if __name__ == "__main__":
    main()
