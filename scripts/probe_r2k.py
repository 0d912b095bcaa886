"""Phase profile of the compact engine on chip (teapot_2k, current HEAD).

Uses _render_device_compact's profile_skip to isolate phase costs:
full - skip("trace")   = trace (wave-1 + bounces)
full - skip("compact") = compaction forward
full - skip("expand")  = expansion chain
remainder              = cull + shade + meta + quantize
Then the full bench-equivalent device number.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rust_raytrace_tpu.engine import (Engine, _camera_rays_tiled,
                                      _render_device_compact)
from rust_raytrace_tpu.models import teapot

F32 = jnp.float32


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

    def dev_render(k, skip=(), cb=512):
        img, wc, _, _ = _render_device_compact(
            eng.tensors, eng.aabb_lo, eng.aabb_hi, ob, d, alive, k,
            maxdepth=vp.maxdepth, ray_chunk=rb, page_size=ps,
            fixed_rng=False, interpret=False, want_primary=False,
            quantize=True, weight_cutoff=1 / 512, pk0=pk0, nbuf=eng.nbuf,
            plt_i=eng.plt_i, plt_s=eng.plt_s, ab_tab=eng.ab_tab,
            profile_skip=skip, cb=cb)
        return img, wc

    def bench(skip=(), cb=512, n=3):
        img, wc = dev_render(key, skip, cb)
        np.asarray(img[:1, :8])
        ts = []
        for i in range(n):
            t0 = time.perf_counter()
            img, wc = dev_render(jax.random.PRNGKey(i), skip, cb)
            np.asarray(img[:1, :8])
            ts.append(time.perf_counter() - t0)
        return min(ts), wc

    full, wc = bench()
    rays = int(np.asarray(wc).sum())
    print(f"wave_counts: {np.asarray(wc).tolist()}", flush=True)
    print(f"FULL cb=512: {full*1e3:.1f} ms  ({rays/full/1e6:.1f} Mrays/s)",
          flush=True)
    for skip in (("trace",), ("expand",),
                 ("trace", "compact", "expand")):
        dt, _ = bench(skip)
        print(f"skip {skip}: {dt*1e3:.1f} ms  (delta {1e3*(full-dt):.1f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
