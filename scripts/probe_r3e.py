import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_rt"))
import numpy as np

def synthetic_100k():
    from rust_raytrace_tpu import math3d as m3
    from rust_raytrace_tpu.camera import create_viewport
    from rust_raytrace_tpu.geometry import make_sphere
    from rust_raytrace_tpu.materials import matte
    from rust_raytrace_tpu.scene import assemble
    s = make_sphere((0.0, 0.0, 10.0), 4.0, (224, 224),
                    matte(m3.make_color((252, 119, 0)), 0.2), 0.0)
    return assemble([s]), create_viewport((2560, 1440), (1.6, 0.9), (0.0, 0.0, 0.0),
                         m3.unit(m3.vec(0.0, 0.0, 1.0)), 90.0, 0.0, 5, 1)

def main():
    import jax
    from rust_raytrace_tpu.engine import Engine
    from rust_raytrace_tpu.models import multi, teapot
    from rust_raytrace_tpu.utils.devbench import device_metric
    print("device:", jax.devices()[0], flush=True)
    BASE_NS = 19.38
    def run(name, build, spp=1, copts=None, **ekw):
        try:
            scene, vp = build()
            eng = Engine(scene, **ekw)
            note = (f"P={eng.page_size} NP={eng.pages.num_pages}")
            mr, dt, rays = device_metric(eng, vp, spp=spp, compiler_options=copts)
            per_ray = dt / rays * 1e9
            print(f"{name}: {mr:.2f} Mrays/s ({dt*1e3:.1f} ms, {per_ray:.2f} ns/ray, "
                  f"{per_ray/BASE_NS:.2f}x) [{note}]", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
    run("multi_2k finekey+gate", lambda: multi.build(resolution="2k"))
    run("synthetic_100k finekey+gate", synthetic_100k,
        copts={"xla_tpu_scoped_vmem_limit_kib": "65536"})
    run("teapot_2k check", lambda: teapot.build(resolution="2k"))

main()
