"""Sub-35ms phase costs via in-jit x16 loops (one tunnel round trip total).

Each op runs 16x inside one jit with a carry-dependency perturbation (the
tunnel floors any single dispatch at ~30 ms; CLAUDE.md platform rule)."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rust_raytrace_tpu.engine import Engine, _camera_rays_tiled
from rust_raytrace_tpu.models import teapot
from rust_raytrace_tpu.ops.cull_pallas import cull_mask_exact_pallas
from rust_raytrace_tpu.ops.shade import shade_pallas

F32 = jnp.float32
N = 16


def timeit(f, n=3):
    x = f()
    np.asarray(x)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        x = f()
        np.asarray(x)
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3 / N


def main():
    print("device:", jax.devices()[0], flush=True)
    scene, vp = teapot.build(resolution="2k")
    rb, ps = 1024, 64
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
    NC = R // rb

    @jax.jit
    def cull_loop(o_, d_):
        def body(i, c):
            m, tm = cull_mask_exact_pallas(o_ + c * F32(1e-30), d_, alive,
                                           eng.aabb_lo, eng.aabb_hi, rb)
            return c + tm[0, 0]
        return jax.lax.fori_loop(0, N, body, F32(0.0))

    print(f"cull wave-0 x{N}: {timeit(lambda: cull_loop(ob, d)):.2f} ms/it",
          flush=True)

    mask, tmin = cull_mask_exact_pallas(ob, d, alive, eng.aabb_lo,
                                        eng.aabb_hi, rb)

    @jax.jit
    def argsort_loop(tm):
        def body(i, c):
            pl_ = jnp.argsort(tm + c * F32(1e-30), axis=1, stable=True)
            return c + pl_[0, 0].astype(F32)
        return jax.lax.fori_loop(0, N, body, F32(0.0))

    print(f"argsort x{N}: {timeit(lambda: argsort_loop(tmin)):.2f} ms/it",
          flush=True)

    state = jnp.zeros((16, R), F32).at[0:3].set(ob).at[3:6].set(d) \
        .at[6].set(1.0).at[7].set(alive.astype(F32))
    rows = jnp.zeros((16, R), F32)
    seed = jnp.zeros((2,), jnp.uint32)

    for frac, name in ((1.0, "all"), (0.2, "1/5")):
        live = (jnp.arange(NC) < int(NC * frac)).astype(jnp.int32)

        @jax.jit
        def shade_loop(st, live=live):
            def body(i, c):
                s2 = shade_pallas(st + c * F32(1e-30), rows, seed, rb=rb,
                                  fixed_rng=False, weight_cutoff=1 / 512,
                                  chunk_live=live)
                return c + s2[8, 0]
            return jax.lax.fori_loop(0, N, body, F32(0.0))

        print(f"shade {name} x{N}: {timeit(lambda: shade_loop(state)):.2f} "
              f"ms/it", flush=True)

    # camera ray generation
    @jax.jit
    def cam_loop(k):
        def body(i, c):
            o2, d2 = _camera_rays_tiled(
                jnp.asarray(vp.orig) + c * F32(1e-30), jnp.asarray(vp.cam),
                jnp.asarray(vp.vu), jnp.asarray(vp.vv), k, width=vp.width,
                height=vp.height, spp=1, tile=32, n_pad=R)
            return c + d2[0, 0]
        return jax.lax.fori_loop(0, N, body, F32(0.0))

    print(f"camera x{N}: {timeit(lambda: cam_loop(key)):.2f} ms/it",
          flush=True)


if __name__ == "__main__":
    main()
