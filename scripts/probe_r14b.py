"""Offline intrinsic-predicate-work measurement per bench config (round 4).

VERDICT r3 next-item 3: the per-config "intrinsic-bound" defense must become
a roofline MEASUREMENT — triangle predicate FLOPs/ray x rays/s vs VPU peak —
instead of a ratio argued against the loop's own budget.  This probe
computes the NUMERATOR's per-ray work model for every bench config, at each
config's production page size:

  eff_w0      mean pages a CAMERA ray must intrinsically visit (slab-hit
              pages whose entry tlo <= the ray's final hit t; raw slab-hit
              count for miss rays — the front-to-back lower bound, same
              definition as probe_r9a)
  eff_bounce  the same for scattered bounce rays (cosine-lobe samples from
              wave-0 hit points, probe_r9a's construction)
  eff_feeler  for lights configs: pages a shadow feeler must visit (entry
              tlo <= min(first occluder t, distance to light) — the any_hit
              intrinsic bound)
  hitfrac_*   fraction of rays that hit geometry (reported for context and
              for validating bench.py's feeler-count estimate — bench
              counts feelers as rays - R0, i.e. one per post-wave-0 ray,
              which equals one per parent hit; hitfrac itself is NOT a
              bench input)

Intrinsic predicate FLOPs/ray = eff * P * FLOPS_PER_SLOT_TEST, where
FLOPS_PER_SLOT_TEST = 51 counts the arithmetic of the packed predicate
(ops/intersect_perlane._group.predicate): md_n dot3 = 5, t = dot3+sub+div
= 7, each of dv0/dv1/dv2 = two dot3 + mul + add + sub = 13.  Comparisons,
selects, slab tests, and winner bookkeeping are EXCLUDED — the numerator is
pure useful predicate math, so the resulting utilization is conservative.

bench.py multiplies these constants by its live-measured rays/s and divides
by the chip's measured VPU fp32 peak (scripts/probe_r14a.py / bench's own
microbench) to report per-config predicate MFU.

Run (CPU, ~5 min dominated by the 1M-sphere):
  JAX_PLATFORMS=cpu python scripts/probe_r14b.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from rust_raytrace_tpu.camera import camera_rays
from rust_raytrace_tpu.ops.intersect_ref import nearest_hit_model
from rust_raytrace_tpu.ops.pages import build_pages, kd_order

F32 = np.float32
FLOPS_PER_SLOT_TEST = 51


def slab_eff(pages, O, D, thit, batch=2048):
    """Mean intrinsic page visits: slab-hit pages with entry tlo <= thit
    (thit = +inf for miss rays -> raw slab-hit count).  Chunked over rays:
    the [batch, NP, 3] slab intermediate stays under ~1 GB at NP ~ 20k."""
    lo = pages.aabb_lo[None]
    hi = pages.aabb_hi[None]
    tot = 0.0
    n = len(O)
    for c0 in range(0, n, batch):
        o = O[c0:c0 + batch]
        d = D[c0:c0 + batch]
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = 1.0 / d[:, None, :]
            inv = np.where(np.isfinite(inv), inv,
                           np.where(d[:, None, :] >= 0, 1e30, -1e30))
            t1 = (lo - o[:, None, :]) * inv
            t2 = (hi - o[:, None, :]) * inv
        tlo = np.minimum(t1, t2).max(axis=2)
        thi = np.maximum(t1, t2).min(axis=2)
        ent = (tlo <= thi) & (thi >= 0)
        eff = (ent & (tlo <= thit[c0:c0 + batch, None])).sum(axis=1)
        tot += eff.sum()
    return tot / n


def scatter_rays(tris, O, D, t, hid, seed=7):
    """Cosine-lobe bounce samples from hit points (probe_r9a construction)."""
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
    return o2.astype(F32), d2.astype(F32), p, n


def eval_config(name, tris, vp, P, stride, light=None):
    t0 = time.time()
    pages = build_pages(tris, page_size=P, order=kd_order(tris, P))
    O, D = camera_rays(vp)
    O = O.reshape(vp.height, vp.width, 3)[::stride, ::stride].reshape(-1, 3)
    D = D.reshape(vp.height, vp.width, 3)[::stride, ::stride].reshape(-1, 3)
    O = O.astype(F32)
    D = D.astype(F32)

    th, hid = nearest_hit_model(O, D, pages)
    thit0 = np.where(hid != 0, th, np.inf).astype(F32)
    eff_w0 = slab_eff(pages, O, D, thit0)
    hitfrac_w0 = float((hid != 0).mean())

    o2, d2, hitp, hitn = scatter_rays(tris, O, D, th, hid)
    th2, hid2 = nearest_hit_model(o2, d2, pages)
    thit2 = np.where(hid2 != 0, th2, np.inf).astype(F32)
    eff_b = slab_eff(pages, o2, d2, thit2)
    hitfrac_b = float((hid2 != 0).mean())

    out = {
        "P": int(P),
        "NP": int(pages.num_pages),
        "eff_w0": round(float(eff_w0), 3),
        "eff_bounce": round(float(eff_b), 3),
        "hitfrac_w0": round(hitfrac_w0, 4),
        "hitfrac_bounce": round(hitfrac_b, 4),
    }
    if light is not None:
        # shadow feelers: hit point -> light center, any_hit bound =
        # pages entering before min(first occluder t, light distance)
        lc = np.asarray(light, dtype=F32)
        df = lc[None, :] - (hitp + 1e-4 * hitn)
        dist = np.linalg.norm(df, axis=1)
        df = df / dist[:, None]
        of = (hitp + 1e-4 * hitn).astype(F32)
        tf, hf = nearest_hit_model(of, df.astype(F32), pages)
        tcut = np.minimum(np.where(hf != 0, tf, np.inf), dist).astype(F32)
        out["eff_feeler"] = round(float(slab_eff(pages, of, df, tcut)), 3)
    print(f"{name}: {out}  ({time.time() - t0:.1f}s, "
          f"{len(O)} camera / {len(o2)} bounce rays)", flush=True)
    return out


def sphere_scene(nseg):
    from rust_raytrace_tpu import math3d as m3
    from rust_raytrace_tpu.camera import create_viewport
    from rust_raytrace_tpu.geometry import make_sphere
    from rust_raytrace_tpu.materials import matte
    from rust_raytrace_tpu.scene import assemble

    s = make_sphere((0.0, 0.0, 10.0), 4.0, (nseg, nseg),
                    matte(m3.make_color((252, 119, 0)), 0.2), 0.0)
    vpc = create_viewport((2560, 1440), (1.6, 0.9), (0.0, 0.0, 0.0),
                          m3.unit(m3.vec(0.0, 0.0, 1.0)), 90.0, 0.0, 5, 1)
    return assemble([s]), vpc


def main():
    from rust_raytrace_tpu.engine import auto_page_size
    from rust_raytrace_tpu.models import circles, multi, teapot

    res = {}
    sc, vp = teapot.build(resolution="2k")
    res["teapot_2k"] = eval_config("teapot_2k", sc.tris, vp, 56, 8)

    # teapot_512_spp4's square 512x512 viewport has its own ray
    # distribution (ADVICE r4: it must not reuse the 16:9 numbers).
    # eff is measured at pixel centers — the half-pixel spp jitter moves
    # camera rays < 1e-3 rad and cannot change slab-page economics.
    sc, vp512 = teapot.build(resolution=(512, 512))
    res["teapot_512_spp4"] = eval_config(
        "teapot_512_spp4", sc.tris, vp512, 56, 2)

    scl, vpl = teapot.build(resolution="2k", with_light=True)
    lc = np.asarray(scl.lights.orig, dtype=F32)
    res["teapot_2k_shadows"] = eval_config(
        "teapot_2k_shadows", scl.tris, vpl, 56, 8, light=lc)

    sc, vp = circles.build(resolution="2k")
    res["circles_2k"] = eval_config(
        "circles_2k", sc.tris, vp, auto_page_size(len(sc.tris) - 1), 8)

    sc, vp = multi.build(resolution="2k")
    res["multi_2k"] = eval_config("multi_2k", sc.tris, vp, 56, 8)

    sc, vp = sphere_scene(224)
    res["synthetic_100k_2k"] = eval_config(
        "synthetic_100k_2k", sc.tris, vp,
        auto_page_size(len(sc.tris) - 1), 8)

    sc, vp = sphere_scene(708)            # ~1.0M tris, streamed regime: P=56
    res["synthetic_1m_2k"] = eval_config(
        "synthetic_1m_2k", sc.tris, vp, 56, 16)

    print("\nWORK_MODEL =", json.dumps(res, indent=1), flush=True)


if __name__ == "__main__":
    main()
