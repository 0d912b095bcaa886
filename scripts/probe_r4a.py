"""Offline (CPU, numpy) page-partition quality probe — round 4.

The per-lane bounce kernel's step count is driven by each ray's SLAB-HIT
page count (docs/PERF.md: bounce waves are 71% of the render; intrinsic
workload teapot 3.9 pages/bounce-ray at P=56).  The winner (t, id) is
partition-independent, so any builder that lowers slab-hit counts is a
free bit-exact win.

Compares, on bounce-like rays sampled via the numpy model:
  kd      — current production: page-aligned median split, LONGEST axis
  kd-sa   — page-aligned median split, axis minimizing the sum of child
            AABB surface areas
  kd-sah  — page-aligned SAH: axis AND split position minimizing
            SA(L)*nL + SA(R)*nR over all page-multiple positions

Metrics per builder: mean slab-hit pages/ray, p90, and mean-of-group-max
over count-SORTED 128-lane groups (the actual loop bound the kernel pays
after the in-chunk count sort).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from rust_raytrace_tpu.ops.pages import build_pages, kd_order
from rust_raytrace_tpu.ops.intersect_ref import nearest_hit_model
from rust_raytrace_tpu.camera import camera_rays

F32 = np.float32


def kd_order_generic(c_all, page_size, mode):
    """KD orders with alternative split rules.  c_all: [N, 3] incenters
    (slot 0 = sentinel, excluded)."""
    out = []

    def half_area(lo, hi):
        e = np.maximum(hi - lo, 0.0)
        return e[0] * e[1] + e[1] * e[2] + e[2] * e[0]

    def rec(ids):
        n = len(ids)
        if n <= page_size:
            out.append(ids)
            return
        cc = c_all[ids]
        k = -(-n // page_size)
        if mode == "kd":
            axis = int(np.argmax(cc.max(axis=0) - cc.min(axis=0)))
            nl = (k // 2) * page_size
            order = np.argsort(cc[:, axis], kind="stable")
        elif mode == "kd-sa":
            nl = (k // 2) * page_size
            best = None
            for ax in range(3):
                o = np.argsort(cc[:, ax], kind="stable")
                s = cc[o]
                cost = (half_area(s[:nl].min(0), s[:nl].max(0))
                        + half_area(s[nl:].min(0), s[nl:].max(0)))
                if best is None or cost < best[0]:
                    best = (cost, o)
            order = best[1]
        elif mode == "kd-sah":
            best = None
            for ax in range(3):
                o = np.argsort(cc[:, ax], kind="stable")
                s = cc[o]
                # prefix/suffix AABBs
                pmin = np.minimum.accumulate(s, axis=0)
                pmax = np.maximum.accumulate(s, axis=0)
                smin = np.minimum.accumulate(s[::-1], axis=0)[::-1]
                smax = np.maximum.accumulate(s[::-1], axis=0)[::-1]
                for kl in range(1, k):
                    nl_c = kl * page_size
                    if nl_c >= n:
                        break
                    sal = half_area(pmin[nl_c - 1], pmax[nl_c - 1])
                    sar = half_area(smin[nl_c], smax[nl_c])
                    cost = sal * nl_c + sar * (n - nl_c)
                    if best is None or cost < best[0]:
                        best = (cost, o, nl_c)
            _, order, nl = best
        else:
            raise ValueError(mode)
        rec(ids[order[:nl]])
        rec(ids[order[nl:]])

    rec(np.arange(1, len(c_all), dtype=np.int64))
    return np.concatenate(out)


def sample_bounce_rays(tris, vp, stride=6, seed=7):
    """Primary hits via the numpy model -> cosine-ish scattered rays."""
    O, D = camera_rays(vp)
    O = O.reshape(vp.height, vp.width, 3)[::stride, ::stride].reshape(-1, 3)
    D = D.reshape(vp.height, vp.width, 3)[::stride, ::stride].reshape(-1, 3)
    pages = build_pages(tris, page_size=56,
                        order=kd_order(tris, 56))
    t, hid = nearest_hit_model(O, D, pages)
    hit = hid != 0
    O, D, t, hid = O[hit], D[hit], t[hit], hid[hit]
    p = O + t[:, None] * D
    n = tris.norm[hid]
    back = np.einsum("rc,rc->r", n, D) > 0
    n = np.where(back[:, None], -n, n)
    rng = np.random.default_rng(seed)
    u = rng.normal(size=p.shape).astype(F32)
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    d2 = n + u
    nz = np.linalg.norm(d2, axis=1, keepdims=True)
    d2 = np.where(nz > 1e-6, d2 / np.maximum(nz, 1e-6), n)
    o2 = p + 1e-4 * n
    return o2.astype(F32), d2.astype(F32)


def slab_counts(pages, O, D):
    lo = pages.aabb_lo[None]                     # [1, NP, 3]
    hi = pages.aabb_hi[None]
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / D[:, None, :]
        inv = np.where(np.isfinite(inv), inv,
                       np.where(D[:, None, :] >= 0, 1e30, -1e30))
        t1 = (lo - O[:, None, :]) * inv
        t2 = (hi - O[:, None, :]) * inv
    tlo = np.minimum(t1, t2).max(axis=2)
    thi = np.maximum(t1, t2).min(axis=2)
    ent = (tlo <= thi) & (thi >= 0)
    return ent.sum(axis=1)


def group_max_sorted(cnt, g=128):
    s = np.sort(cnt)
    pad = (-len(s)) % g
    if pad:
        s = np.concatenate([s, np.zeros(pad, s.dtype)])
    return s.reshape(-1, g).max(axis=1).mean()


def evaluate(name, tris, vp, page_size=56):
    o2, d2 = sample_bounce_rays(tris, vp)
    print(f"\n== {name}: {len(tris)} tris, {len(o2)} bounce rays, "
          f"P={page_size} ==")
    for mode in ("kd", "kd-sa", "kd-sah"):
        order = kd_order_generic(tris.incenter, page_size, mode)
        pages = build_pages(tris, page_size=page_size, order=order)
        cnt = slab_counts(pages, o2, d2)
        print(f"  {mode:7s} NP={pages.num_pages:4d} "
              f"mean={cnt.mean():6.3f} p90={np.percentile(cnt, 90):5.1f} "
              f"sorted-groupmax={group_max_sorted(cnt):6.2f}")


def main():
    from rust_raytrace_tpu.models import teapot, multi
    scene, vp = teapot.build(resolution="2k")
    evaluate("teapot", scene.tris, vp)
    scene, vp = multi.build(resolution="2k")
    evaluate("multi", scene.tris, vp, page_size=56)


if __name__ == "__main__":
    main()
