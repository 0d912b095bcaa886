"""cb sweep DOWNWARD (256, 128) now that the conds are gone — one-hot build
and permute matmul cost scale as R*cb, per-chunk overhead as R/cb."""

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

    def dev_render(k, cb):
        img, wc, _, _ = _render_device_compact(
            eng.tensors, eng.aabb_lo, eng.aabb_hi, ob, d, alive, k,
            maxdepth=vp.maxdepth, ray_chunk=rb, page_size=ps,
            fixed_rng=False, interpret=False, want_primary=False,
            quantize=True, weight_cutoff=1 / 512, pk0=pk0, nbuf=eng.nbuf,
            plt_i=eng.plt_i, plt_s=eng.plt_s, ab_tab=eng.ab_tab, cb=cb)
        return img, wc

    for cb in (512, 256, 128):
        img, wc = dev_render(key, cb)
        np.asarray(img[:1, :8])
        rays = int(np.asarray(wc).sum())
        ND = 8
        ts = []
        for i in range(2):
            t0 = time.perf_counter()
            for j in range(ND):
                img, _ = dev_render(jax.random.PRNGKey(i * ND + j), cb)
            np.asarray(img[:1, :8])
            ts.append((time.perf_counter() - t0) / ND)
        dt = min(ts)
        print(f"cb={cb}: {dt*1e3:.1f} ms ({rays/dt/1e6:.1f} Mrays/s)",
              flush=True)


if __name__ == "__main__":
    main()
