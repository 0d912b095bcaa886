"""Isolated: old cull+argsort vs fused sorted cull, wave-0 shapes, on chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rust_raytrace_tpu.engine import Engine, _camera_rays_tiled
from rust_raytrace_tpu.models import teapot
from rust_raytrace_tpu.ops.cull_pallas import (cull_mask_exact_pallas,
                                               cull_sorted_pallas)

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
    lo, hi = eng.aabb_lo, eng.aabb_hi

    @jax.jit
    def old(o, d, a):
        mask, tmin = cull_mask_exact_pallas(o, d, a, lo, hi, rb)
        counts = jnp.sum(mask, axis=1, dtype=jnp.int32)
        plist = jnp.argsort(tmin, axis=1, stable=True).astype(jnp.int32)
        ptmin = jnp.take_along_axis(tmin, plist, axis=1)
        return counts, plist, ptmin

    @jax.jit
    def old_nosort(o, d, a):
        mask, tmin = cull_mask_exact_pallas(o, d, a, lo, hi, rb)
        counts = jnp.sum(mask, axis=1, dtype=jnp.int32)
        return counts, tmin

    @jax.jit
    def new(o, d, a):
        return cull_sorted_pallas(o, d, a, lo, hi, rb)

    for name, f in (("old cull+argsort", old), ("old cull only", old_nosort),
                    ("fused sorted cull", new)):
        out = f(o, d, alive)
        np.asarray(out[0][:1])
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = f(o, d, alive)
            np.asarray(out[0][:1])
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {min(ts)*1e3:.1f} ms (wall incl ~30ms tunnel)",
              flush=True)


if __name__ == "__main__":
    main()
