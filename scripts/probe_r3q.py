import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_rt"))
import numpy as np
def main():
    import jax
    import rust_raytrace_tpu.ops.intersect_perlane as ipl
    from rust_raytrace_tpu.engine import Engine
    from rust_raytrace_tpu.models import teapot
    from rust_raytrace_tpu.utils.devbench import device_metric
    print("device:", jax.devices()[0], flush=True)
    scene, vp = teapot.build(resolution="2k")
    for name, th in (("14cls", (1.,2.,3.,4.,5.,6.,7.,8.,10.,12.,15.,19.,24.)),
                     ("7cls", (1.,2.,3.,5.,8.,12.))):
        ipl.SORT_THRESH = th
        eng = Engine(scene)
        mr, dt, rays = device_metric(eng, vp)
        print(f"teapot_2k {name}: {mr:.2f} Mrays/s ({dt*1e3:.1f} ms)", flush=True)
main()
