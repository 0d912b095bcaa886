"""Offline page-partition probe — round 9: spatial DUPLICATING builders.

The production pages are a PARTITION (each triangle in exactly one page,
SAH KD order): page AABBs overlap wherever geometry straddles a split, and
an overlapped box weakens the per-lane front-to-back cut (a ray must visit
every slab-hit page whose entry tlo <= its final hit t).  The reference's
own octree (raytrace.rs:790-845) instead DUPLICATES triangles into every
leaf they touch, giving non-overlapping leaf boxes and an exact spatial
cut.  Duplication is bit-exact for the kernel contract: the winner is the
lexicographic (t, id) min, and a duplicate tests to the identical (t, id).

This probe measures whether the trade (dup -> more pages, higher fixed
slab cost + possibly more banks; tighter boxes -> fewer effective visits)
can pay, BEFORE any kernel work:

  raw    = slab-hit page count per bounce ray (the count-sort key)
  eff    = pages with slab-hit AND tlo <= t_hit (the true per-lane loop
           bound: pages are visited in tlo order and the cut can only
           retire pages entering beyond the current best, which reaches
           t_hit only at/after the winner page; miss rays pay raw)
  gmax   = mean over count-sorted 128-lane groups of the group max of eff
           (the kernel's actual while-loop bound after the in-chunk sort)
  tests  = eff * P (triangle-test proxy; per-step gather+predicate cost
           scales with P)

Builders:
  prod      SAH KD partition at page_size P (production)
  sdup-mid  spatial KD, split at the midpoint of the longest axis,
            triangles duplicated into every child their AABB overlaps
  sdup-med  same but split at the member-centroid median (clamped 10-90%
            of the box) -- adapts to skewed distributions

Run (CPU): python scripts/probe_r9a.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from rust_raytrace_tpu.camera import camera_rays
from rust_raytrace_tpu.ops.intersect_ref import nearest_hit_model
from rust_raytrace_tpu.ops.pages import PageTables, build_pages, kd_order, \
    pack_features

F32 = np.float32


def spatial_dup_pages(tris, page_size, mode="mid", max_depth=32):
    """Spatial KD with duplication; leaf = one page (or several when a
    region refuses to split).  Page AABB = node box clipped to the bbox of
    member corners (every hit point on a member triangle inside the node
    region is contained; exact for the front-to-back contract)."""
    corners = tris.corners            # [N, 3, 3]
    tlo_all = corners.min(axis=1)
    thi_all = corners.max(axis=1)
    cen = tris.incenter

    pages = []            # (ids, lo, hi)

    def emit(ids, blo, bhi):
        lo = np.maximum(blo, tlo_all[ids].min(axis=0))
        hi = np.minimum(bhi, thi_all[ids].max(axis=0))
        pages.append((ids, lo, hi))

    def rec(ids, blo, bhi, depth):
        n = len(ids)
        if n <= page_size or depth >= max_depth:
            for k in range(0, n, page_size):
                emit(ids[k:k + page_size], blo, bhi)
            return
        ext = bhi - blo
        ax = int(np.argmax(ext))
        if mode == "mid":
            cut = blo[ax] + 0.5 * ext[ax]
        else:
            med = np.median(cen[ids][:, ax])
            cut = np.clip(med, blo[ax] + 0.1 * ext[ax],
                          bhi[ax] - 0.1 * ext[ax])
        left = ids[tlo_all[ids][:, ax] <= cut]
        right = ids[thi_all[ids][:, ax] >= cut]
        if len(left) == n and len(right) == n:
            for k in range(0, n, page_size):
                emit(ids[k:k + page_size], blo, bhi)
            return
        llo, lhi = blo.copy(), bhi.copy()
        lhi[ax] = cut
        rlo, rhi = blo.copy(), bhi.copy()
        rlo[ax] = cut
        if len(left):
            rec(left, llo, lhi, depth + 1)
        if len(right):
            rec(right, rlo, rhi, depth + 1)

    ids0 = np.arange(1, len(tris), dtype=np.int64)
    rec(ids0, tlo_all[1:].min(axis=0).astype(np.float64),
        thi_all[1:].max(axis=0).astype(np.float64), 0)

    NP = len(pages)
    pk = np.zeros((NP, page_size, 128), dtype=F32)
    lo = np.full((NP, 3), np.inf, dtype=F32)
    hi = np.full((NP, 3), -np.inf, dtype=F32)
    ndup = 0
    for i, (ids, blo, bhi) in enumerate(pages):
        pk[i, :len(ids)] = pack_features(tris, ids)
        lo[i] = blo
        hi[i] = bhi
        ndup += len(ids)
    pt = PageTables(PK=pk, page_size=page_size, num_tris=len(tris),
                    aabb_lo=lo, aabb_hi=hi)
    return pt, ndup / max(1, len(tris) - 1)


def sample_bounce_rays(tris, vp, stride, seed=7):
    O, D = camera_rays(vp)
    O = O.reshape(vp.height, vp.width, 3)[::stride, ::stride].reshape(-1, 3)
    D = D.reshape(vp.height, vp.width, 3)[::stride, ::stride].reshape(-1, 3)
    pages = build_pages(tris, page_size=56, order=kd_order(tris, 56))
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


def slab(pages, O, D):
    lo = pages.aabb_lo[None]
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
    return ent, tlo


def gmax_sorted(raw, eff, g=128):
    o = np.argsort(raw, kind="stable")
    e = eff[o]
    pad = (-len(e)) % g
    if pad:
        e = np.concatenate([e, np.zeros(pad, e.dtype)])
    return e.reshape(-1, g).max(axis=1).mean()


def evaluate(name, tris, vp, P, stride):
    o2, d2 = sample_bounce_rays(tris, vp, stride)
    # true nearest hit t for the bounce rays (partition-independent)
    ref_pages = build_pages(tris, page_size=56, order=kd_order(tris, 56))
    th, hh = nearest_hit_model(o2, d2, ref_pages)
    thit = np.where(hh != 0, th, np.inf)
    print(f"\n== {name}: {len(tris)} tris, {len(o2)} bounce rays, P={P} ==",
          flush=True)

    def show(tag, pages, dup):
        ent, tlo = slab(pages, o2, d2)
        raw = ent.sum(axis=1)
        eff = (ent & (tlo <= thit[:, None])).sum(axis=1)
        NP = pages.num_pages
        nb = -(-NP // 128)
        print(f"  {tag:9s} NP={NP:5d} banks={nb:2d} dup={dup:4.2f} "
              f"raw={raw.mean():6.2f} eff={eff.mean():6.2f} "
              f"gmax={gmax_sorted(raw, eff):6.2f} "
              f"tests={eff.mean() * pages.page_size:7.1f}", flush=True)

    show("prod", build_pages(tris, page_size=P, order=kd_order(tris, P)), 1.0)
    for mode in ("mid", "med"):
        pt, dup = spatial_dup_pages(tris, P, mode=mode)
        show(f"sdup-{mode}", pt, dup)


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
    evaluate("synthetic_100k", sc.tris, vpc, P=112, stride=64)


if __name__ == "__main__":
    main()
