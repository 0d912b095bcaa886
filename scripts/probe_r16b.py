"""Round-5 probe r16b (chip): profiler op budget for synthetic_1m at the
new streamed defaults (P=224, worklist kernel + guess prefetch).

probe_r16a found the smoking gun: the full render is 766.7 ms with wave 0
at 103.7 ms, yet the RAW streamed trace kernel on the real 818k-ray wave-1
batch (800 compacted chunks) costs only 28.4 ms (5.5k visits, 24k group
passes) — so ~550 ms of the bounce share is NOT traversal.  This probe
attributes it op-by-op (the probe_r8a perfetto pattern).

Run: nohup python scripts/probe_r16b.py > /tmp/probe_r16b.log 2>&1 &
(serialize: nothing else may use the tunnel)
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_rt"))

import numpy as np

VMEM_OPT = {"xla_tpu_scoped_vmem_limit_kib": "65536"}


def main():
    import jax
    import jax.numpy as jnp

    from rust_raytrace_tpu import math3d as m3
    from rust_raytrace_tpu.camera import create_viewport
    from rust_raytrace_tpu.engine import (Engine, _camera_rays_tiled,
                                          _render_device_compact, pick_tile)
    from rust_raytrace_tpu.geometry import make_sphere
    from rust_raytrace_tpu.materials import matte
    from rust_raytrace_tpu.scene import assemble

    s = make_sphere((0.0, 0.0, 10.0), 4.0, (708, 708),
                    matte(m3.make_color((252, 119, 0)), 0.2), 0.0)
    vp = create_viewport((2560, 1440), (1.6, 0.9), (0.0, 0.0, 0.0),
                         m3.unit(m3.vec(0.0, 0.0, 1.0)), 90.0, 0.0, 5, 1)
    scene = assemble([s])
    eng = Engine(scene)
    assert eng.streamed and not eng.bank_major
    eng.render(vp, key=jax.random.PRNGKey(7))       # plan the schedule
    eng._auto_schedule = False
    print(f"schedule after autotune: {eng.ncompact}", flush=True)
    rb = eng.ray_chunk
    R0 = vp.height * vp.width
    R = -(-R0 // rb) * rb
    key = jax.random.PRNGKey(0)
    o, d = _camera_rays_tiled(
        jnp.asarray(vp.orig), jnp.asarray(vp.cam), jnp.asarray(vp.vu),
        jnp.asarray(vp.vv), key, width=vp.width, height=vp.height, spp=1,
        tile=pick_tile(vp.width, vp.height), n_pad=R)
    alive = jnp.arange(R) < R0
    ob = jnp.broadcast_to(jnp.asarray(vp.cam)[:, None], o.shape)

    @jax.jit
    def f(k):
        img, wc, _, _ = _render_device_compact(
            eng.tensors, eng.aabb_lo, eng.aabb_hi, ob, d, alive, k,
            maxdepth=vp.maxdepth, ray_chunk=rb, page_size=eng.page_size,
            fixed_rng=False, interpret=False, want_primary=False,
            quantize=True, weight_cutoff=eng.weight_cutoff, pk0=None,
            nbuf=eng.nbuf, ncompact=eng.ncompact, slt_i=eng.slt_i,
            slt_s=eng.slt_s, s_ab=eng.s_ab, s_bank_ab=eng.s_bank_ab,
            bank_major=False)
        return img

    fc = f.lower(key).compile(compiler_options=VMEM_OPT)
    img = fc(key)
    np.asarray(img[:1, :8])
    logdir = "/tmp/jaxprof_r16b"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir, create_perfetto_trace=True):
        img = fc(jax.random.PRNGKey(1))
        np.asarray(img[:1, :8])
    paths = glob.glob(f"{logdir}/**/*.json.gz", recursive=True)
    with gzip.open(paths[0], "rt") as fh:
        trace = json.load(fh)
    by = defaultdict(float)
    cnt = defaultdict(int)
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e:
            by[e.get("name", "?")] += e["dur"]
            cnt[e.get("name", "?")] += 1
    print(f"=== synthetic_1m (P={eng.page_size} NP={eng.pages.num_pages} "
          f"nc={eng.ncompact}) ===", flush=True)
    for name, dur in sorted(by.items(), key=lambda kv: -kv[1])[:34]:
        print(f"{dur/1e3:9.2f} ms x{cnt[name]:<4d} {name[:90]}", flush=True)


if __name__ == "__main__":
    main()
