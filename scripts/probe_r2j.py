"""On-chip check of the priority-encoder per-lane kernel (dynamic t-cut):
correctness vs the numpy model on a scattered batch, then kernel-only timing,
then the full teapot_2k device render."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rust_raytrace_tpu.engine import Engine
from rust_raytrace_tpu.models import teapot
from rust_raytrace_tpu.ops.intersect_perlane import (ROW_ID, ROW_T,
                                                     trace_perlane_pallas)
from rust_raytrace_tpu.ops.intersect_ref import nearest_hit_model

F32 = jnp.float32


def main():
    print("device:", jax.devices()[0], flush=True)
    scene, vp = teapot.build(resolution="2k")
    eng = Engine(scene, page_size=64, ray_chunk=1024)

    rng = np.random.default_rng(1)
    R = 1228800   # ~1.2M, wave-2 scale
    o = rng.normal(size=(3, R)).astype(np.float32) * 1.5 \
        + np.array([[0.0], [0.0], [20.0]], np.float32)
    d = rng.normal(size=(3, R)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    ot, dt = jnp.asarray(o), jnp.asarray(d)
    av = jnp.ones((R,), bool)

    def run(any_hit=False):
        return trace_perlane_pallas(ot, dt, av, eng.plt_i, eng.plt_s,
                                    eng.ab_tab, 64, 1024, any_hit=any_hit)

    out = run()
    out_h = np.asarray(out[:2, :2048])
    # correctness vs model on a slice
    t_m, id_m = nearest_hit_model(o[:, :2048].T, d[:, :2048].T, eng.pages)
    t_k, id_k = out_h[ROW_T], out_h[ROW_ID].astype(np.int32)
    hit_ok = ((id_k != 0) == (id_m != 0)).all()
    ids_ok = (id_k == id_m).mean()
    print(f"correctness: hitset {hit_ok}, id agree {ids_ok:.4f}", flush=True)

    def bench(f, n=3):
        x = f()
        np.asarray(x[:1, :1])
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            x = f()
            np.asarray(x[:1, :1])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    dt_n = bench(lambda: run())
    print(f"perlane nearest 1.2M scattered: {dt_n*1e3:.1f} ms "
          f"({R/dt_n/1e6:.1f} Mrays/s)", flush=True)
    dt_a = bench(lambda: run(any_hit=True))
    print(f"perlane any-hit 1.2M scattered: {dt_a*1e3:.1f} ms "
          f"({R/dt_a/1e6:.1f} Mrays/s)", flush=True)


if __name__ == "__main__":
    main()
