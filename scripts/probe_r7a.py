"""Round-7 probe A (offline, numpy): would a GROUP-UNION traversal beat
the per-lane kernel if lanes were sorted for page coherence?

The per-lane bounce kernel (ops/intersect_perlane.py) pays, per 128-lane
group, `group_max_slab_count` while-loop steps, each step = one per-lane
take_along_axis gather of a [17P, 128] page column + predicate + selection
(loop split probe_r4e: fixed 10.4 / gather+selection ~10.2 / predicate
~9.4 ms per 32.4 ms scattered batch).  An alternative shape: sort lanes so
each group's rays share pages, then traverse the group's UNION page list —
every lane tests the SAME page per step (a dynamic sublane slice of the
VMEM table, no gather; selection is a [1, 128]-scale min instead of
[128, 128]).  Union steps cost ~predicate only, so the union shape wins iff

    sum_groups union_size  <  sum_groups max_count * (32.4 - 10.4) / (9.4 + 10.4/steps...)

— conservatively, union must be under ~2.1x... practically we want the
RATIO union/groupmax per sort key; below ~1.5 it is worth a chip A/B,
above ~2 it is a documented dead end (the front-to-back t-cut, which the
raw slab counts here ignore, further favors the per-lane shape: its cut is
per-lane exact while a union cut only fires when ALL lanes pass it).

Sort keys compared (within each 1024-lane chunk, groups of 128):
  count       — production (in-chunk count sort)
  first       — (first slab-hit page, count)
  firstpair   — (first page, second page, count)
  octdir      — (direction octant, first page, count)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from rust_raytrace_tpu.ops.pages import build_pages, kd_order
from scripts.probe_r4a import sample_bounce_rays

F32 = np.float32


def slab_matrix(pages, O, D):
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
    return (tlo <= thi) & (thi >= 0)          # [R, NP]


def group_stats(hit, order, g=128, chunk=1024):
    """Per-128-group (after per-chunk sort by `order` key) loop bounds."""
    R = hit.shape[0]
    pad = (-R) % chunk
    if pad:
        hit = np.concatenate([hit, np.zeros((pad, hit.shape[1]), bool)])
        order = np.concatenate([order, np.full(pad, np.inf)])
    R2 = hit.shape[0]
    maxs, unions = [], []
    for c0 in range(0, R2, chunk):
        sl = slice(c0, c0 + chunk)
        perm = np.argsort(order[sl], kind="stable")
        h = hit[sl][perm]
        for g0 in range(0, chunk, g):
            hg = h[g0:g0 + g]
            cnt = hg.sum(axis=1)
            if cnt.max() == 0:
                continue
            maxs.append(cnt.max())
            unions.append(hg.any(axis=0).sum())
    return np.array(maxs), np.array(unions)


def keys_for(hit, D):
    NPg = hit.shape[1]
    cnt = hit.sum(axis=1).astype(np.float64)
    iota = np.arange(NPg)
    first = np.where(hit, iota[None], NPg).min(axis=1).astype(np.float64)
    # second page: min of hits excluding the first
    h2 = hit.copy()
    h2[np.arange(len(hit)), np.clip(first.astype(int), 0, NPg - 1)] = False
    second = np.where(h2, iota[None], NPg).min(axis=1).astype(np.float64)
    octant = ((D[:, 0] >= 0) * 4 + (D[:, 1] >= 0) * 2
              + (D[:, 2] >= 0)).astype(np.float64)
    B = float(NPg + 1)
    return {
        "count": cnt,
        "first": first * 64 + np.minimum(cnt, 63),
        "firstpair": (first * B + second) * 64 + np.minimum(cnt, 63),
        "octdir": (octant * B + first) * 64 + np.minimum(cnt, 63),
    }


def evaluate(name, tris, vp, page_size=56):
    o2, d2 = sample_bounce_rays(tris, vp)
    order = kd_order(tris, page_size)
    pages = build_pages(tris, page_size=page_size, order=order)
    hit = slab_matrix(pages, o2, d2)
    print(f"\n== {name}: {len(tris)} tris NP={pages.num_pages} "
          f"{len(o2)} bounce rays P={page_size} ==")
    print(f"  mean slab count {hit.sum(1).mean():.2f}")
    for kname, key in keys_for(hit, d2).items():
        maxs, unions = group_stats(hit, key)
        print(f"  {kname:10s} groupmax mean={maxs.mean():6.2f} "
              f"union mean={unions.mean():7.2f} "
              f"ratio={unions.mean() / maxs.mean():5.2f}")


def main():
    from rust_raytrace_tpu.models import multi, teapot
    scene, vp = teapot.build(resolution="2k")
    evaluate("teapot", scene.tris, vp)
    scene, vp = multi.build(resolution="2k")
    evaluate("multi", scene.tris, vp)


if __name__ == "__main__":
    main()
