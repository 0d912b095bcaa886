"""Per-lane kernel cost dissection at realistic bounce scale (in-jit x8
loops, one tunnel round trip per variant): sort on/off, chunk sizes.

Workload: surface-anchored origins, lambertian-like directions (the real
bounce distribution, unlike probe_r2j's uniform ball)."""

import functools
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
N = 8


def main():
    print("device:", jax.devices()[0], flush=True)
    scene, vp = teapot.build(resolution="2k")
    eng = Engine(scene)
    ps = eng.page_size

    rng = np.random.default_rng(1)
    R = 1228800
    tris = scene.tris
    pick = rng.integers(1, len(tris), R)
    o = tris.incenter[pick].T.astype(np.float32)
    nr = tris.norm[pick].T
    rv = rng.normal(size=(3, R)); rv /= np.linalg.norm(rv, axis=0)
    sgn = np.where(rng.uniform(size=(1, R)) < 0.5, 1.0, -1.0)
    d = (nr * sgn + rv).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    o = (o + rv * 0.001).astype(np.float32)
    ot, dt = jnp.asarray(o), jnp.asarray(d)
    av = jnp.ones((R,), bool)

    def timed(rb, sort, n=3):
        @jax.jit
        def loop(o_, d_):
            def body(i, c):
                out = trace_perlane_pallas(o_ + c * F32(1e-30), d_, av,
                                           eng.plt_i, eng.plt_s, eng.ab_tab,
                                           ps, rb, sort_lanes=sort)
                return c + out[0, 0]
            return jax.lax.fori_loop(0, N, body, F32(0.0))

        x = loop(ot, dt)
        np.asarray(x)
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            x = loop(ot, dt)
            np.asarray(x)
            ts.append(time.perf_counter() - t0)
        ms = min(ts) * 1e3 / N
        print(f"rb={rb} sort={sort}: {ms:.1f} ms ({R/ms/1e3:.1f} Mrays/s)",
              flush=True)

    for rb, sort in ((1024, True), (1024, False), (2048, True),
                     (512, True)):
        timed(rb, sort)


if __name__ == "__main__":
    main()
