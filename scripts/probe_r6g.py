import os, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_rt"))
import jax
from rust_raytrace_tpu.engine import Engine
from rust_raytrace_tpu.models import multi, teapot
from rust_raytrace_tpu.utils.devbench import device_metric
from rust_raytrace_tpu import math3d as m3
from rust_raytrace_tpu.camera import create_viewport
from rust_raytrace_tpu.geometry import make_sphere
from rust_raytrace_tpu.materials import matte
from rust_raytrace_tpu.scene import assemble

def synthetic_100k():
    s = make_sphere((0.0, 0.0, 10.0), 4.0, (224, 224),
                    matte(m3.make_color((252, 119, 0)), 0.2), 0.0)
    vp = create_viewport((2560, 1440), (1.6, 0.9), (0.0, 0.0, 0.0),
                         m3.unit(m3.vec(0.0, 0.0, 1.0)), 90.0, 0.0, 5, 1)
    return assemble([s]), vp

def run(name, build, spp=1, copts=None, **ekw):
    scene, vp = build()
    eng = Engine(scene, **ekw)
    mr, dt, rays = device_metric(eng, vp, spp=spp, compiler_options=copts)
    print(f"{name}: {mr:.2f} Mrays/s ({dt*1e3:.1f} ms) [sched={eng.ncompact}]", flush=True)

run("teapot_2k srcgather", lambda: teapot.build(resolution="2k"))
run("multi_2k srcgather", lambda: multi.build(resolution="2k"))
run("synthetic_100k srcgather", synthetic_100k,
    copts={"xla_tpu_scoped_vmem_limit_kib": "65536"})
run("light srcgather", lambda: teapot.build(resolution="2k", with_light=True))
