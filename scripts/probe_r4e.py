"""Per-step cost split of the per-lane traversal loop UNDER SAH PAGES
(round-4 planning; updates probe_r2s whose pre-banking signature is stale).

Modes (monkeypatched throwaway _group variants, nb=1 teapot only):
  prod     — the real _group (baseline; includes count-sort classes upstream)
  full     — simplified t/id-only loop (probe model: 1 page/step, no payload)
  nopred   — same loop, gather kept, predicate replaced by a row touch
  nogather — same loop, gather replaced by a static slice, predicate kept
  noloop   — slab + selection only (no while body at all)

Run: nohup python scripts/probe_r4e.py > /tmp/probe_r4e.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_rt"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from rust_raytrace_tpu.engine import Engine
from rust_raytrace_tpu.models import teapot
from rust_raytrace_tpu.ops import intersect_perlane as PLN

F32 = jnp.float32
N = 8


def make_group(mode):
    def group(plt, plts, sub_p, o3, d3, a1, excl, ab_ref, out_ref, sl, P,
              any_hit, nb=1, sb=None, bankcnt=None):
        valid = a1[0:1, :] != 0.0

        @pl.when(jnp.any(valid))
        def _():
            tlo, thi, page_ok = PLN._slab(ab_ref[0:128], o3, d3)
            hit = (tlo <= thi) & (thi >= 0.0) & valid & page_ok
            hit_f0 = hit.astype(F32)
            page_f2 = sub_p.astype(F32)
            o0, o1, o2 = (o3[k:k + 1, :] for k in range(3))
            d0, d1, d2 = (d3[k:k + 1, :] for k in range(3))

            def feat(G, f):
                return G[f * P:(f + 1) * P, :]

            def dot3(G, f0, r0, r1, r2):
                return (feat(G, f0) * r0 + feat(G, f0 + 1) * r1
                        + feat(G, f0 + 2) * r2)

            def body(carry):
                work, hit_f, best_t, best_id, best_pg = carry
                del work
                tkey = jnp.where(hit_f > 0.0, tlo, jnp.inf)
                kmin = jnp.min(tkey, axis=0, keepdims=True)
                has = kmin < jnp.inf
                pidx = jnp.where(
                    has,
                    jnp.min(jnp.where(tkey == kmin, page_f2, F32(128.0)),
                            axis=0, keepdims=True), F32(128.0))
                page = jnp.where(has, pidx, 0.0)
                if mode == "nogather":
                    G = plt[0:17 * P, 0:128]     # static slice, no gather
                else:
                    idx = jnp.broadcast_to(page.astype(jnp.int32),
                                           (17 * P, 128))
                    G = jnp.take_along_axis(plt[0:17 * P], idx, axis=1)
                if mode == "nopred":
                    t = feat(G, 12)              # touch the table, no math
                    ok = (t >= 0.0) & has
                    ids = feat(G, 16)
                else:
                    md_n = dot3(G, 0, d0, d1, d2)
                    t = (feat(G, 12) - dot3(G, 0, o0, o1, o2)) / md_n
                    dv0 = dot3(G, 3, o0, o1, o2) \
                        + t * dot3(G, 3, d0, d1, d2) - feat(G, 13)
                    dv1 = dot3(G, 6, o0, o1, o2) \
                        + t * dot3(G, 6, d0, d1, d2) - feat(G, 14)
                    dv2 = dot3(G, 9, o0, o1, o2) \
                        + t * dot3(G, 9, d0, d1, d2) - feat(G, 15)
                    ids = feat(G, 16)
                    ok = (t >= 0.0) & (dv0 <= 1.0) & (dv1 <= 1.0) \
                        & (dv2 <= 1.0) & has
                tt = jnp.where(ok, t, jnp.inf)
                pmin = jnp.min(tt, axis=0, keepdims=True)
                pid = jnp.min(jnp.where(tt == pmin, ids, jnp.inf), axis=0,
                              keepdims=True)
                upd = (pmin < best_t) | ((pmin == best_t) & ~jnp.isinf(pmin)
                                         & (pid < best_id))
                best_t = jnp.where(upd, pmin, best_t)
                best_id = jnp.where(upd, pid, best_id)
                best_pg = jnp.where(upd, page, best_pg)
                keep = (page_f2 != pidx) & (tlo <= best_t)
                hit_f = hit_f * keep.astype(F32)
                return jnp.max(hit_f), hit_f, best_t, best_id, best_pg

            def cond(c):
                return c[0] > 0.0

            init_t = jnp.where(valid, jnp.inf, -jnp.inf)
            zero = jnp.zeros_like(init_t)
            if mode == "noloop":
                best_t, best_id = jnp.max(hit_f0) + init_t, zero
            else:
                _, _, best_t, best_id, _ = jax.lax.while_loop(
                    cond, body, (jnp.max(hit_f0), hit_f0, init_t, zero,
                                 zero))
            out_ref[0:1, sl] = best_t
            out_ref[1:2, sl] = best_id

    return group


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
    orig = PLN._group

    def timed(name, n=3, sort_lanes=None):
        @jax.jit
        def loop(o_, d_):
            def body(i, c):
                out = PLN.trace_perlane_pallas(
                    o_ + c * F32(1e-30), d_, av, eng.plt_i, eng.plt_s,
                    eng.ab_tab, ps, 1024, sort_lanes=sort_lanes)
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
        print(f"{name}: {ms:.1f} ms", flush=True)
        PLN.trace_perlane_pallas.clear_cache()

    modes = sys.argv[1:] or ["prod", "full", "nopred", "noloop"]
    # "nogather" CRASHES the TPU worker (Mosaic miscompile; probe_r2s saw
    # the same) — predicate cost is derived as full - nopred instead.
    try:
        for mode in modes:
            if mode == "prod":
                timed("prod (real _group, fused payload)")
                continue
            if mode == "sortoff":
                timed("prod sort_lanes=False", sort_lanes=False)
                continue
            PLN._group = make_group(mode)
            timed(f"{mode}")
    finally:
        PLN._group = orig
        PLN.trace_perlane_pallas.clear_cache()


if __name__ == "__main__":
    main()
