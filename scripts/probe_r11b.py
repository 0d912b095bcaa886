"""probe_r11b (chip): profiler op budget for the LIGHTS config.

teapot_2k_shadows runs at 1.94x no-lights per-ray (185.8 vs 95.7 ms).
Bounce-wave feelers are fused into the per-lane kernel (any_hit between
trace and shade), but WAVE 0's feelers still pay the unfused chain:
trace rows -> _shadow_mask (a second packet cull + union any-hit trace)
-> standalone shade_pallas.  Before fusing anything, rank where the extra
~90 ms actually sits: per-wave bounce kernels (intrinsic feeler work) vs
the wave-0 chain (fusable overhead).

Run: nohup python scripts/probe_r11b.py > /tmp/probe_r11b.log 2>&1 &
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


def main():
    import jax
    import jax.numpy as jnp

    from rust_raytrace_tpu.engine import (Engine, _camera_rays_tiled,
                                          _render_device_compact)
    from rust_raytrace_tpu.models import teapot

    scene, vp = teapot.build(resolution="2k", with_light=True)
    eng = Engine(scene)
    eng.render(vp, key=jax.random.PRNGKey(7))       # plan the schedule
    eng._auto_schedule = False
    rb = eng.ray_chunk
    R0 = vp.height * vp.width
    R = -(-R0 // rb) * rb
    key = jax.random.PRNGKey(0)
    o, d = _camera_rays_tiled(
        jnp.asarray(vp.orig), jnp.asarray(vp.cam), jnp.asarray(vp.vu),
        jnp.asarray(vp.vv), key, width=vp.width, height=vp.height, spp=1,
        tile=32, n_pad=R)
    alive = jnp.arange(R) < R0
    ob = jnp.broadcast_to(jnp.asarray(vp.cam)[:, None], o.shape)
    pk0 = eng._pk0_cache.get(tuple(np.asarray(vp.cam,
                                              dtype=np.float32).tolist()))
    lights = eng.scene.lights

    @jax.jit
    def f(k):
        img, wc, _, _ = _render_device_compact(
            eng.tensors, eng.aabb_lo, eng.aabb_hi, ob, d, alive, k,
            maxdepth=vp.maxdepth, ray_chunk=rb, page_size=eng.page_size,
            fixed_rng=False, interpret=False, want_primary=False,
            quantize=True, weight_cutoff=eng.weight_cutoff, pk0=pk0,
            has_lights=True,
            light_orig=jnp.asarray(lights.orig, dtype=jnp.float32),
            light_len2=jnp.asarray(lights.len2, dtype=jnp.float32),
            nbuf=eng.nbuf, plt_i=eng.plt_i, plt_s=eng.plt_s,
            ab_tab=eng.ab_tab, ncompact=eng.ncompact,
            gate_frac=eng.gate_frac)
        return img

    img = f(key)
    np.asarray(img[:1, :8])
    logdir = "/tmp/jaxprof_r11b"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir, create_perfetto_trace=True):
        img = f(jax.random.PRNGKey(1))
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
    print(f"=== teapot2k+light (P={eng.page_size} NP={eng.pages.num_pages} "
          f"nc={eng.ncompact}) ===", flush=True)
    for name, dur in sorted(by.items(), key=lambda kv: -kv[1])[:32]:
        print(f"{dur/1e3:9.2f} ms x{cnt[name]:<4d} {name[:80]}", flush=True)


if __name__ == "__main__":
    main()
