"""Offline sort-key probe — round 9b: can a cheap key beat the raw count?

The in-chunk count sort groups lanes by (primary bank, slab-hit count
class); each 128-lane gather group then pays its MAX per-lane visit count
in the traversal while-loop.  probe_r9a measured the gap between that
bound and the true per-lane visit count `eff` (= pages with entry tlo <=
the lane's final hit t; raw for miss lanes): teapot gmax 2.16 vs eff
1.87, multi 2.76 vs 1.98, synthetic 3.00 vs 1.55 — the raw count is a
weak predictor of eff, so groups mix cheap and expensive lanes.

Candidate keys (all computable in the count pass):
  cnt    raw slab-hit count (production)
  kexit  #pages with tlo <= thi_first, where thi_first is the EXIT of the
         lane's nearest-entry page — if the ray hits inside its first page
         (the common case for bounce rays), every page entering beyond
         that exit is cut, so kexit ~ eff.  Needs the tlo/thi matrices a
         second time (free at nb=1: they are live in one shot; nb>1 pays
         a second slab loop or staged scratch).
  eff    the oracle itself (unachievable upper bound).

Groups are formed per RB=1024 chunk (8 groups of 128) as the kernel does:
stable sort by (primary bank, quantized class), then mean over groups of
the group max of eff.  Reported per scene: that bound for each key.

Run (CPU): python scripts/probe_r9b.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from probe_r9a import sample_bounce_rays, slab
from rust_raytrace_tpu.ops.intersect_ref import nearest_hit_model
from rust_raytrace_tpu.ops.pages import build_pages, kd_order
from rust_raytrace_tpu.ops.intersect_perlane import SORT_THRESH

RB = 1024


def quantize(v):
    q = np.zeros_like(v, dtype=np.int64)
    for thr in SORT_THRESH:
        q += v > thr
    return q


def group_bound(key_class, pbank, eff, nb):
    """Mean over count-sorted 128-lane groups (per RB-chunk) of max eff."""
    n = len(eff)
    pad = (-n) % RB
    if pad:
        key_class = np.concatenate([key_class, np.full(pad, 10 ** 6)])
        pbank = np.concatenate([pbank, np.full(pad, nb)])
        eff = np.concatenate([eff, np.zeros(pad, eff.dtype)])
    tot = 0.0
    ng = 0
    for c0 in range(0, len(eff), RB):
        sl = slice(c0, c0 + RB)
        order = np.argsort(pbank[sl] * (len(SORT_THRESH) + 2) + key_class[sl],
                           kind="stable")
        e = eff[sl][order]
        gm = e.reshape(-1, 128).max(axis=1)
        tot += gm.sum()
        ng += len(gm)
    return tot / ng


def evaluate(name, tris, vp, P, stride):
    o2, d2 = sample_bounce_rays(tris, vp, stride)
    pages = build_pages(tris, page_size=P, order=kd_order(tris, P))
    ref_pages = build_pages(tris, page_size=56, order=kd_order(tris, 56))
    th, hh = nearest_hit_model(o2, d2, ref_pages)
    thit = np.where(hh != 0, th, np.inf)

    ent, tlo = slab(pages, o2, d2)
    # recompute thi for kexit (slab() returns only ent/tlo)
    lo = pages.aabb_lo[None]
    hi = pages.aabb_hi[None]
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / d2[:, None, :]
        inv = np.where(np.isfinite(inv), inv,
                       np.where(d2[:, None, :] >= 0, 1e30, -1e30))
        t1 = (lo - o2[:, None, :]) * inv
        t2 = (hi - o2[:, None, :]) * inv
    thi = np.maximum(t1, t2).min(axis=2)

    raw = ent.sum(axis=1)
    eff = (ent & (tlo <= thit[:, None])).sum(axis=1)

    tloh = np.where(ent, tlo, np.inf)
    first = np.argmin(tloh, axis=1)
    has = np.isfinite(tloh.min(axis=1))
    thi_first = np.where(has, thi[np.arange(len(first)), first], -np.inf)
    kexit = (ent & (tlo <= thi_first[:, None])).sum(axis=1)

    NP = pages.num_pages
    nb = -(-NP // 128)
    pbank = np.where(ent.any(axis=1),
                     np.argmax(ent, axis=1) // 128, nb).astype(np.int64)

    print(f"\n== {name}: NP={NP} banks={nb} rays={len(o2)} "
          f"eff-mean={eff.mean():5.2f} ==", flush=True)
    for tag, key in (("cnt", quantize(raw)), ("kexit", quantize(kexit)),
                     ("eff*", quantize(eff)), ("eff-exact", eff)):
        print(f"  {tag:9s} group-bound={group_bound(key, pbank, eff, nb):6.3f}",
              flush=True)
    # correlation diagnostics
    hit = np.isfinite(thit)
    print(f"  kexit==eff frac={np.mean(kexit == eff):.3f} "
          f"(hit rays {np.mean((kexit == eff)[hit]):.3f}); "
          f"raw==eff frac={np.mean(raw == eff):.3f}", flush=True)


def main():
    from rust_raytrace_tpu.models import multi, teapot
    scene, vp = teapot.build(resolution="2k")
    evaluate("teapot", scene.tris, vp, P=56, stride=8)
    scene, vp = multi.build(resolution="2k")
    evaluate("multi", scene.tris, vp, P=56, stride=8)

    from rust_raytrace_tpu import math3d as m3
    from rust_raytrace_tpu.camera import create_viewport
    from rust_raytrace_tpu.geometry import make_sphere
    from rust_raytrace_tpu.materials import matte
    from rust_raytrace_tpu.scene import assemble
    s = make_sphere((0.0, 0.0, 10.0), 4.0, (224, 224),
                    matte(m3.make_color((252, 119, 0)), 0.2), 0.0)
    vpc = create_viewport((2560, 1440), (1.6, 0.9), (0.0, 0.0, 0.0),
                          m3.unit(m3.vec(0.0, 0.0, 1.0)), 90.0, 0.0, 5, 1)
    sc = assemble([s])
    evaluate("synthetic_100k", sc.tris, vpc, P=112, stride=48)


if __name__ == "__main__":
    main()
