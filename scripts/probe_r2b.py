"""Marginal wave costs of the compact render path on chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rust_raytrace_tpu.engine import (Engine, _camera_rays_tiled,
                                      _render_device_compact, _render_device)
from rust_raytrace_tpu.models import teapot

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
    from rust_raytrace_tpu.ops.intersect_pallas import fold_pages_origin
    pk0 = fold_pages_origin(eng.tensors.PK, jnp.asarray(vp.cam, dtype=F32))

    def bench(f, n=3):
        out = f(jax.random.PRNGKey(9))
        np.asarray(out[0].reshape(-1)[:8])
        ts = []
        for i in range(n):
            t0 = time.perf_counter()
            out = f(jax.random.PRNGKey(i))
            np.asarray(out[0].reshape(-1)[:8])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    prev = None
    for md in (1, 2, 3, 4, 5):
        def f(k, md=md):
            img, wc, _, _ = _render_device_compact(
                eng.tensors, eng.aabb_lo, eng.aabb_hi, ob, d, alive, k,
                maxdepth=md, ray_chunk=rb, page_size=64, fixed_rng=False,
                interpret=False, want_primary=False, quantize=True,
                weight_cutoff=1 / 512, pk0=pk0, nbuf=4)
            return img, wc
        t = bench(f)
        d_s = "" if prev is None else f"  (+{(t-prev)*1e3:.1f})"
        print(f"compact maxdepth={md}: {t*1e3:.1f} ms{d_s}", flush=True)
        prev = t

    # wave-count stats for context
    img, wc, _, _ = _render_device_compact(
        eng.tensors, eng.aabb_lo, eng.aabb_hi, ob, d, alive,
        jax.random.PRNGKey(0), maxdepth=5, ray_chunk=rb, page_size=64,
        fixed_rng=False, interpret=False, want_primary=False, quantize=True,
        weight_cutoff=1 / 512, pk0=pk0, nbuf=4)
    print("wave alive counts:", np.asarray(wc).tolist(), flush=True)


if __name__ == "__main__":
    main()
