"""Round-6 probe B: why are synthetic_100k's bounce waves 1-3 flat ~58 ms?

Check wave populations (does the wave-1 prefix stay hot through waves 2-4?),
then re-sweep ncompact 2/3/4 for the two multi-bank scenes — if late waves
keep most rays alive, more boundaries should now pay (they are
prefix-priced).  Also bounce_rb=512 under the dynamic grids.

Run: nohup python scripts/probe_r6b.py > /tmp/probe_r6b.log 2>&1 &
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
    from rust_raytrace_tpu.models import multi
    from rust_raytrace_tpu.utils.devbench import device_metric

    print("device:", jax.devices()[0], flush=True)

    # wave populations first (one render, fetch wave counts)
    for name, build, copts in [("synthetic_100k", synthetic_100k, VMEM_OPT),
                               ("multi_2k",
                                lambda: multi.build(resolution="2k"), None)]:
        scene, vp = build()
        eng = Engine(scene)
        res = eng.render(vp, key=jax.random.PRNGKey(0))
        print(f"{name}: wave_rays={res.wave_rays.tolist()} "
              f"P={eng.page_size} NP={eng.pages.num_pages}", flush=True)

    def run(name, build, copts=None, **ekw):
        try:
            scene, vp = build()
            eng = Engine(scene, **ekw)
            mr, dt, rays = device_metric(eng, vp, compiler_options=copts)
            print(f"{name}: {mr:.2f} Mrays/s device ({dt*1e3:.1f} ms, "
                  f"{dt/rays*1e9:.2f} ns/ray)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)

    run("synthetic_100k nc=3", synthetic_100k, VMEM_OPT, ncompact=3)
    run("synthetic_100k nc=4", synthetic_100k, VMEM_OPT, ncompact=4)
    run("multi_2k nc=4", lambda: multi.build(resolution="2k"), ncompact=4)
    run("synthetic_100k nc=2 brb=512", synthetic_100k, VMEM_OPT,
        ncompact=2, bounce_chunk=512)


if __name__ == "__main__":
    main()
