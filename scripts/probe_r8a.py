"""Round-8 probe A (chip): fresh profiler op budgets under the
pipelined-DMA compact/expand kernels (probe_r7b) + the r7c-confirmed
{0,1} schedule.

PERF.md's op table predates r7b; re-rank the remaining levers at the
95.3 ms headline:
  - teapot_2k (1 bank)
  - multi_2k  (3 banks)

Run: nohup python scripts/probe_r8a.py > /tmp/probe_r8a.log 2>&1 &
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


def profile_one(tag, build, copts=None):
    import jax
    import jax.numpy as jnp

    from rust_raytrace_tpu.engine import (Engine, _camera_rays_tiled,
                                          _render_device_compact)

    scene, vp = build()
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

    @jax.jit
    def f(k):
        img, wc, _, _ = _render_device_compact(
            eng.tensors, eng.aabb_lo, eng.aabb_hi, ob, d, alive, k,
            maxdepth=vp.maxdepth, ray_chunk=rb, page_size=eng.page_size,
            fixed_rng=False, interpret=False, want_primary=False,
            quantize=True, weight_cutoff=eng.weight_cutoff, pk0=pk0,
            nbuf=eng.nbuf, plt_i=eng.plt_i, plt_s=eng.plt_s,
            ab_tab=eng.ab_tab, ncompact=eng.ncompact,
            gate_frac=eng.gate_frac)
        return img

    if copts is not None:
        f = f.lower(key).compile(compiler_options=copts)
    img = f(key)
    np.asarray(img[:1, :8])
    logdir = f"/tmp/jaxprof_r8a_{tag}"
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
    print(f"=== {tag} (P={eng.page_size} NP={eng.pages.num_pages} "
          f"nc={eng.ncompact}) ===", flush=True)
    for name, dur in sorted(by.items(), key=lambda kv: -kv[1])[:28]:
        print(f"{dur/1e3:9.2f} ms x{cnt[name]:<4d} {name[:80]}", flush=True)


def main():
    from rust_raytrace_tpu.models import multi, teapot

    profile_one("teapot2k", lambda: teapot.build(resolution="2k"))
    profile_one("multi2k", lambda: multi.build(resolution="2k"))


if __name__ == "__main__":
    main()
