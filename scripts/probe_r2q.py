"""Profile the production device render with jax.profiler and report the
top ops by device time (parsed from the perfetto trace)."""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rust_raytrace_tpu.engine import (Engine, _camera_rays_tiled,
                                      _render_device_compact)
from rust_raytrace_tpu.models import teapot

F32 = jnp.float32
LOGDIR = "/tmp/jaxprof"


def main():
    print("device:", jax.devices()[0], flush=True)
    scene, vp = teapot.build(resolution="2k")
    rb, ps = 1024, 56
    eng = Engine(scene, page_size=ps, ray_chunk=rb)

    key = jax.random.PRNGKey(0)
    R0 = vp.height * vp.width
    R = -(-R0 // rb) * rb
    o, d = _camera_rays_tiled(
        jnp.asarray(vp.orig), jnp.asarray(vp.cam), jnp.asarray(vp.vu),
        jnp.asarray(vp.vv), key, width=vp.width, height=vp.height,
        spp=1, tile=32, n_pad=R)
    alive = jnp.arange(R) < R0
    ob = jnp.broadcast_to(jnp.asarray(vp.cam)[:, None], o.shape)
    cam_key = tuple(np.asarray(vp.cam, dtype=np.float32).tolist())
    pk0 = eng._pk0_cache.get(cam_key)

    def dev_render(k):
        img, wc, _, _ = _render_device_compact(
            eng.tensors, eng.aabb_lo, eng.aabb_hi, ob, d, alive, k,
            maxdepth=vp.maxdepth, ray_chunk=rb, page_size=ps,
            fixed_rng=False, interpret=False, want_primary=False,
            quantize=True, weight_cutoff=1 / 512, pk0=pk0, nbuf=eng.nbuf,
            plt_i=eng.plt_i, plt_s=eng.plt_s, ab_tab=eng.ab_tab)
        return img

    img = dev_render(key)
    np.asarray(img[:1, :8])

    os.system(f"rm -rf {LOGDIR}")
    with jax.profiler.trace(LOGDIR, create_perfetto_trace=True):
        img = dev_render(jax.random.PRNGKey(1))
        np.asarray(img[:1, :8])

    paths = glob.glob(f"{LOGDIR}/**/*.json.gz", recursive=True)
    print("trace files:", paths, flush=True)
    if not paths:
        return
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", trace if isinstance(trace, list) else [])
    # find TPU op track durations
    by_name = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            by_name[name] += e["dur"]
            cnt[name] += 1
    top = sorted(by_name.items(), key=lambda kv: -kv[1])[:40]
    total = sum(by_name.values())
    print(f"total event time {total/1e3:.1f} ms (may double-count tracks)",
          flush=True)
    for name, dur in top:
        print(f"{dur/1e3:9.2f} ms  x{cnt[name]:<5d} {name[:100]}", flush=True)


if __name__ == "__main__":
    main()
