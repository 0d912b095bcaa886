"""Round-2 on-chip probes: phase costs + primitive micro-benchmarks.

Run on the real TPU:  nohup python scripts/probe_r2.py > /tmp/probe_r2.log 2>&1 &
Timing rule (CLAUDE.md): block_until_ready returns early through the tunnel;
force completion by fetching a tiny slice.
"""

import os
import sys
import time

# NOTE: do NOT use PYTHONPATH for this — it breaks axon TPU plugin discovery.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rust_raytrace_tpu.engine import Engine, _camera_rays_tiled, _random_unit_rows
from rust_raytrace_tpu.models import teapot
from rust_raytrace_tpu.ops.cull import cull_mask_exact

F32 = jnp.float32


def sync(x):
    return np.asarray(x.reshape(-1)[:1])


def bench(fn, *args, n=5, warm=2):
    for _ in range(warm):
        sync(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print("device:", jax.devices()[0])
    scene, vp = teapot.build(resolution="2k")
    eng = Engine(scene, page_size=64, ray_chunk=1024)
    RB = 1024
    R0 = vp.height * vp.width
    R = -(-R0 // RB) * RB
    NC = R // RB
    NP = eng.tensors.PK.shape[0]
    print(f"R={R} NC={NC} NP={NP}")

    key = jax.random.PRNGKey(0)
    o, d = _camera_rays_tiled(
        jnp.asarray(vp.orig), jnp.asarray(vp.cam), jnp.asarray(vp.vu),
        jnp.asarray(vp.vv), key, width=vp.width, height=vp.height,
        spp=1, tile=32, n_pad=R)
    alive = jnp.arange(R) < R0
    sync(o)

    # 1. exact cull (current lax.map form)
    f_cull = jax.jit(lambda o, d, a: cull_mask_exact(
        o, d, a, eng.aabb_lo, eng.aabb_hi, RB)[0])
    t = bench(f_cull, o, d, alive)
    print(f"cull_mask_exact (lax.map): {t*1e3:.2f} ms")

    # 2. argsort of tmin [NC, NP]
    mask, tmin = jax.jit(lambda o, d, a: cull_mask_exact(
        o, d, a, eng.aabb_lo, eng.aabb_hi, RB))(o, d, alive)
    f_sort = jax.jit(lambda t: jnp.argsort(t, axis=1, stable=True))
    t = bench(f_sort, tmin)
    print(f"argsort [NC,NP]: {t*1e3:.2f} ms")

    # 3. RNG: threefry uniform [3, R]
    f_rng = jax.jit(lambda k: _random_unit_rows(k, R))
    t = bench(f_rng, key)
    print(f"random_unit_rows [3,{R}]: {t*1e3:.2f} ms")

    # 4. cumsum over [NC] (offsets) and [NC, RB] axis-1
    cnt = jnp.sum(alive.reshape(NC, RB), axis=1, dtype=jnp.int32)
    f_cs = jax.jit(lambda c: jnp.cumsum(c))
    t = bench(f_cs, cnt)
    print(f"cumsum [NC]: {t*1e3:.2f} ms")
    a2 = alive.reshape(NC, RB).astype(jnp.int32)
    f_cs2 = jax.jit(lambda a: jnp.cumsum(a, axis=1))
    t = bench(f_cs2, a2)
    print(f"cumsum [NC,RB] axis1: {t*1e3:.2f} ms")

    # 5. elementwise shade-scale op over [16, R] (proxy for shade cost)
    st16 = jnp.ones((16, R), F32)
    f_ew = jax.jit(lambda s: s * 1.0001 + 0.5)
    t = bench(f_ew, st16)
    print(f"elementwise [16,R]: {t*1e3:.2f} ms")

    # 6. full render device time, by wave count (marginal wave costs)
    from rust_raytrace_tpu.engine import _render_device
    pk0 = eng._pk0_cache.get(tuple(np.asarray(vp.cam, dtype=np.float32).tolist()))
    from rust_raytrace_tpu.ops.intersect_pallas import fold_pages_origin
    if pk0 is None:
        pk0 = fold_pages_origin(eng.tensors.PK, jnp.asarray(vp.cam, dtype=F32))
    ob = jnp.broadcast_to(jnp.asarray(vp.cam)[:, None], o.shape)

    for md in (1, 2, 3, 4, 5):
        def f_r(o_, d_, a_, k_):
            img, wc, _ = _render_device(
                eng.tensors, eng.aabb_lo, eng.aabb_hi, o_, d_, a_, k_,
                maxdepth=md, ray_chunk=RB, page_size=64, fixed_rng=False,
                interpret=False, want_primary=False, quantize=True, spp=1,
                weight_cutoff=1 / 512, pk0=pk0, nbuf=4, exact_cull=True)
            return img
        t = bench(jax.jit(f_r, static_argnames=()), ob, d, alive, key, n=3)
        print(f"render maxdepth={md}: {t*1e3:.1f} ms")


if __name__ == "__main__":
    main()
