"""bounce_rb sweep on chip (compact path, fused sorted cull)."""

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
from rust_raytrace_tpu.ops.intersect_pallas import fold_pages_origin

F32 = jnp.float32


def main():
    print("device:", jax.devices()[0], flush=True)
    scene, vp = teapot.build(resolution="2k")
    eng = Engine(scene, page_size=64, ray_chunk=1024)
    rb = 1024
    R0 = vp.height * vp.width
    R = -(-R0 // rb) * rb
    key = jax.random.PRNGKey(0)
    o, d = _camera_rays_tiled(
        jnp.asarray(vp.orig), jnp.asarray(vp.cam), jnp.asarray(vp.vu),
        jnp.asarray(vp.vv), key, width=vp.width, height=vp.height,
        spp=1, tile=32, n_pad=R)
    alive = jnp.arange(R) < R0
    ob = jnp.broadcast_to(jnp.asarray(vp.cam)[:, None], o.shape)
    pk0 = fold_pages_origin(eng.tensors.PK, jnp.asarray(vp.cam, dtype=F32))

    def bench(brb, n=3):
        def f(k):
            img, wc, _, _ = _render_device_compact(
                eng.tensors, eng.aabb_lo, eng.aabb_hi, ob, d, alive, k,
                maxdepth=5, ray_chunk=rb, page_size=64, fixed_rng=False,
                interpret=False, want_primary=False, quantize=True,
                weight_cutoff=1 / 512, pk0=pk0, nbuf=4, bounce_rb=brb,
                plt_i=eng.plt_i, plt_s=eng.plt_s, ab_tab=eng.ab_tab)
            return img
        out = f(jax.random.PRNGKey(9))
        ref = np.asarray(out)
        ts = []
        for i in range(n):
            t0 = time.perf_counter()
            out = f(jax.random.PRNGKey(i))
            np.asarray(out.reshape(-1)[:8])
            ts.append(time.perf_counter() - t0)
        return min(ts), ref

    base, img_ref = bench(0)
    print(f"bounce_rb=0 (1024): {base*1e3:.1f} ms", flush=True)
    for brb in (512,):
        t, img = bench(brb)
        same = (img == img_ref).mean()
        print(f"bounce_rb={brb}: {t*1e3:.1f} ms  (u8 identical: {same:.4f})",
              flush=True)


if __name__ == "__main__":
    main()
