"""Isolated phase micro-benchmarks + full render (current HEAD) on chip:
cull kernel, shade kernel (all-live vs prefix), argsort, then probe_r2k's
phase profile inline."""

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
from rust_raytrace_tpu.ops.cull_pallas import cull_mask_exact_pallas
from rust_raytrace_tpu.ops.shade import shade_pallas

F32 = jnp.float32


def timeit(f, sync, n=3):
    sync(f())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(f())
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


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

    def s_arr(x):
        np.asarray(x[:1, :8] if x.ndim == 2 else x[:8])

    # 1. cull kernel at wave-0 scale
    dt = timeit(lambda: cull_mask_exact_pallas(
        ob, d, alive, eng.aabb_lo, eng.aabb_hi, rb)[0], s_arr)
    print(f"cull wave-0 (3.7M): {dt:.1f} ms", flush=True)

    # 2. argsort on the cull tmin
    mask, tmin = cull_mask_exact_pallas(ob, d, alive, eng.aabb_lo,
                                        eng.aabb_hi, rb)
    dt = timeit(lambda: jnp.argsort(tmin, axis=1, stable=True), s_arr)
    print(f"argsort {tuple(tmin.shape)}: {dt:.1f} ms", flush=True)

    # 3. shade kernel: all chunks live vs 1/5 prefix
    state = jnp.zeros((16, R), F32).at[0:3].set(ob).at[3:6].set(d) \
        .at[6].set(1.0).at[7].set(alive.astype(F32))
    rows = jnp.zeros((16, R), F32)
    seed = jnp.zeros((2,), jnp.uint32)
    NC = R // rb
    for frac, name in ((1.0, "all"), (0.2, "1/5 prefix")):
        live = (jnp.arange(NC) < int(NC * frac)).astype(jnp.int32)
        dt = timeit(lambda live=live: shade_pallas(
            state, rows, seed, rb=rb, fixed_rng=False,
            weight_cutoff=1 / 512, chunk_live=live), s_arr)
        print(f"shade {name}: {dt:.1f} ms", flush=True)

    # 4. full render phase profile
    cam_key = tuple(np.asarray(vp.cam, dtype=np.float32).tolist())
    pk0 = eng._pk0_cache.get(cam_key)

    def dev_render(k, skip=()):
        img, wc, _, _ = _render_device_compact(
            eng.tensors, eng.aabb_lo, eng.aabb_hi, ob, d, alive, k,
            maxdepth=vp.maxdepth, ray_chunk=rb, page_size=ps,
            fixed_rng=False, interpret=False, want_primary=False,
            quantize=True, weight_cutoff=1 / 512, pk0=pk0, nbuf=eng.nbuf,
            plt_i=eng.plt_i, plt_s=eng.plt_s, ab_tab=eng.ab_tab,
            profile_skip=skip)
        return img, wc

    img, wc = dev_render(key)
    s_arr(img)
    rays = int(np.asarray(wc).sum())
    full = timeit(lambda: dev_render(jax.random.PRNGKey(1))[0], s_arr)
    print(f"FULL: {full:.1f} ms ({rays/full/1e3:.1f} Mrays/s)", flush=True)
    for skip in (("trace",), ("expand",), ("trace", "compact", "expand")):
        dt = timeit(lambda skip=skip: dev_render(jax.random.PRNGKey(1),
                                                 skip)[0], s_arr)
        print(f"skip {skip}: {dt:.1f} ms (delta {full-dt:.1f})", flush=True)


if __name__ == "__main__":
    main()
