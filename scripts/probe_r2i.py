"""Per-lane kernel cost structure at wave-2-like scale, on chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rust_raytrace_tpu.engine import Engine
from rust_raytrace_tpu.models import teapot
from rust_raytrace_tpu.ops.intersect_perlane import trace_perlane_pallas

F32 = jnp.float32


def main():
    print("device:", jax.devices()[0], flush=True)
    scene, vp = teapot.build(resolution="2k")
    eng = Engine(scene, page_size=64, ray_chunk=1024)

    # synthetic bounce-like batch at wave-2 scale: origins on the teapot
    # surface region, scattered unit directions
    rng = np.random.default_rng(1)
    R = 1228800   # ~1.2M, multiple of 1024
    o = rng.normal(size=(3, R)).astype(np.float32) * 1.5 \
        + np.array([[0.0], [0.0], [20.0]], np.float32)
    d = rng.normal(size=(3, R)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    ot, dt = jnp.asarray(o), jnp.asarray(d)
    av = jnp.ones((R,), bool)

    # host-side stats: per-ray page counts + per-group max
    lo, hi = np.asarray(eng.aabb_lo), np.asarray(eng.aabb_hi)
    sample = slice(0, 128 * 200)
    os_, ds_ = o[:, sample], d[:, sample]
    with np.errstate(divide="ignore"):
        inv = np.where(ds_ != 0, 1.0 / ds_, np.where(ds_ >= 0, 1e30, -1e30))
    t1 = (lo.T[:, None, :] - os_[:, :, None]) * inv[:, :, None]
    t2 = (hi.T[:, None, :] - os_[:, :, None]) * inv[:, :, None]
    tlo = np.minimum(t1, t2).max(axis=0)
    thi = np.maximum(t1, t2).min(axis=0)
    hits = (tlo <= thi) & (thi >= 0)
    cnts = hits.sum(axis=1)
    gmax = cnts.reshape(-1, 128).max(axis=1)
    print(f"per-ray pages: mean {cnts.mean():.1f} p50 {np.median(cnts):.0f} "
          f"p95 {np.percentile(cnts, 95):.0f} max {cnts.max()}", flush=True)
    print(f"per-group max: mean {gmax.mean():.1f} p95 "
          f"{np.percentile(gmax, 95):.0f}", flush=True)

    def bench(ms, n=3):
        def f(o_, d_):
            return trace_perlane_pallas(o_, d_, av, eng.plt_i, eng.plt_s,
                                        eng.ab_tab, 64, 1024, max_steps=ms)
        out = f(ot, dt)
        np.asarray(out[:1, :1])
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = f(ot, dt)
            np.asarray(out[:1, :1])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for ms in (0, 8, 4, 1):
        print(f"max_steps={ms}: {bench(ms)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
