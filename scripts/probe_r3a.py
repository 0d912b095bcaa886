"""Round-3 probe A: tail-compaction sweep on teapot_2k (device metric).

Times the full compacted render as an in-jit x8 fori loop (the bench's
device-metric pattern) for ncompact in {-1 (all, round-2 baseline), 3, 2}.
Hypothesis: the last compaction boundary (after wave 3) retires few rays for
a fixed ~5 ms compact+expand cost, so skipping it wins.

Run: nohup python scripts/probe_r3a.py > /tmp/probe_r3a.log 2>&1 &
"""

import os
import sys
import time

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

    scene, vp = teapot.build(resolution="2k")
    page_size, rb = 56, 1024
    eng = Engine(scene, page_size=page_size, ray_chunk=rb)

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

    ND = 8

    def make_loop(ncompact):
        @jax.jit
        def dev_loop(key0, o_):
            def body(i, c):
                pert, rays = c
                img, wc = _render_device_compact(
                    eng.tensors, eng.aabb_lo, eng.aabb_hi,
                    o_ + pert * jnp.float32(1e-30), d, alive,
                    jax.random.fold_in(key0, i),
                    maxdepth=vp.maxdepth, ray_chunk=rb, page_size=page_size,
                    fixed_rng=False, interpret=False, want_primary=False,
                    quantize=True, weight_cutoff=1 / 512, pk0=pk0,
                    nbuf=eng.nbuf, plt_i=eng.plt_i, plt_s=eng.plt_s,
                    ab_tab=eng.ab_tab, ncompact=ncompact)[:2]
                return (img[0, 0].astype(jnp.float32),
                        rays + jnp.sum(wc, dtype=jnp.int32))
            return jax.lax.fori_loop(0, ND, body,
                                     (jnp.float32(0.0), jnp.int32(0)))
        return dev_loop

    for ncomp in (-1, 3, 2):
        t0 = time.perf_counter()
        loop = make_loop(ncomp)
        x, rt = loop(key, ob)
        np.asarray(x)
        print(f"ncompact={ncomp}: compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        best = None
        for i in range(3):
            t0 = time.perf_counter()
            x, rt = loop(jax.random.PRNGKey(100 + i), ob)
            np.asarray(x)
            dt = (time.perf_counter() - t0) / ND
            rays = int(np.asarray(rt)) // ND
            mr = rays / dt / 1e6
            print(f"  run {i}: {dt*1e3:.1f} ms/render, {mr:.2f} Mrays/s",
                  flush=True)
            if best is None or mr > best[0]:
                best = (mr, dt)
        print(f"ncompact={ncomp}: BEST {best[1]*1e3:.1f} ms, "
              f"{best[0]:.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
