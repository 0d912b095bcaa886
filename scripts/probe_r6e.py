import os, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_rt"))
import jax
from rust_raytrace_tpu.engine import Engine
from rust_raytrace_tpu.models import teapot
from rust_raytrace_tpu.utils.devbench import device_metric

for name, build, spp in [
        ("teapot_2k", lambda: teapot.build(resolution="2k"), 1),
        ("teapot_sd_spp4", lambda: teapot.build(resolution=(640, 480), samples=4), 4)]:
    scene, vp = build()
    e = Engine(scene)
    r = e.render(vp, key=jax.random.PRNGKey(7))
    print(f"{name}: wave_rays={r.wave_rays.tolist()} -> planned {e.ncompact}", flush=True)

# serialized clean timings: planned vs b4-skip on the 2k headline
scene, vp = teapot.build(resolution="2k")
for sched in [(True, True, False, True), (True, True, False, False)]:
    e = Engine(scene, ncompact=sched)
    mr, dt, rays = device_metric(e, vp)
    print(f"teapot_2k {sched}: {mr:.2f} Mrays/s ({dt*1e3:.1f} ms)", flush=True)
scene, vp = teapot.build(resolution=(640, 480), samples=4)
for sched in [(True, True, False, True), (True, True, False, False)]:
    e = Engine(scene, ncompact=sched)
    mr, dt, rays = device_metric(e, vp, spp=4)
    print(f"teapot_sd_spp4 {sched}: {mr:.2f} Mrays/s ({dt*1e3:.1f} ms)", flush=True)
