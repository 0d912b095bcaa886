"""synthetic_100k page-size re-sweep under the round-6 kernels (gather
permute, exact bank gates, flag refresh, {0,1} schedule)."""
import os, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_rt"))
import jax
from rust_raytrace_tpu.engine import Engine
from rust_raytrace_tpu import math3d as m3
from rust_raytrace_tpu.camera import create_viewport
from rust_raytrace_tpu.geometry import make_sphere
from rust_raytrace_tpu.materials import matte
from rust_raytrace_tpu.scene import assemble
from rust_raytrace_tpu.utils.devbench import device_metric

VMEM = {"xla_tpu_scoped_vmem_limit_kib": "65536"}
s = make_sphere((0.0, 0.0, 10.0), 4.0, (224, 224),
                matte(m3.make_color((252, 119, 0)), 0.2), 0.0)
scene = assemble([s])
vp = create_viewport((2560, 1440), (1.6, 0.9), (0.0, 0.0, 0.0),
                     m3.unit(m3.vec(0.0, 0.0, 1.0)), 90.0, 0.0, 5, 1)
for P in (112, 96, 80, 64):
    try:
        eng = Engine(scene, page_size=P, auto_pages=False,
                     ncompact=(True, True, False, False))
        mr, dt, rays = device_metric(eng, vp, compiler_options=VMEM)
        print(f"P={P} NB={-(-eng.pages.num_pages//128)}: {mr:.2f} Mrays/s "
              f"({dt*1e3:.1f} ms)", flush=True)
    except Exception as e:
        print(f"P={P}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
