"""250k-tri scale probe: per-lane path beyond the old 131072-slot cap
(P=280/7 banks auto vs P=144/14 banks) vs the union fallback."""
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

def scene250():
    s = make_sphere((0.0, 0.0, 10.0), 4.0, (354, 354),
                    matte(m3.make_color((252, 119, 0)), 0.2), 0.0)
    vp = create_viewport((2560, 1440), (1.6, 0.9), (0.0, 0.0, 0.0),
                         m3.unit(m3.vec(0.0, 0.0, 1.0)), 90.0, 0.0, 5, 1)
    return assemble([s]), vp

scene, vp = scene250()
print(f"tris={len(scene.tris)}", flush=True)

def run(name, union=False, copts=VMEM, **ekw):
    try:
        eng = Engine(scene, **ekw)
        note = f"P={eng.page_size} NP={eng.pages.num_pages} plt={'yes' if eng.plt_i is not None else 'no'}"
        if union:
            eng.plt_i = eng.plt_s = eng.ab_tab = None
            note += " FORCED-UNION"
        mr, dt, rays = device_metric(eng, vp, compiler_options=copts)
        print(f"{name}: {mr:.2f} Mrays/s ({dt*1e3:.1f} ms, {dt/rays*1e9:.1f} ns/ray) [{note}]", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)

run("250k auto(P=280)")
run("250k P=144/14banks", page_size=144, auto_pages=False)
run("250k union-fallback", union=True)
