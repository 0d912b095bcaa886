"""Executed-triangle-test counts per config (VERDICT r3 #3, offline leg).

Simulates the production engine's wavefront structure in numpy at reduced
resolution and counts the triangle tests each kernel EXECUTES (not just the
intrinsic hit work):

  wave 0 (union kernel): per RB-chunk page-union size x P x RB — every lane
      of a chunk tests every triangle of every page in the chunk's culled
      list (exactly the union kernel's work shape).  Also the HBM bytes the
      page stream moves (the only page DMA in the render; bounce tables are
      VMEM-resident).
  bounce waves (per-lane kernel): lanes are packed to the compacted prefix
      (boundary schedule {0,1}), in-chunk sorted by (primary bank, slab
      count), grouped in 128s; each live group pays
      sum_b 2*ceil(gmax_b/2) x 128 x P tests (pps=2: page visits round up
      to pairs; dead lanes ride their group's max; dead groups skip via
      any(valid); dead chunks skip via the per-wave flag refresh), where
      gmax_b = group max of per-lane EFFECTIVE pages in bank b (slab-hit
      AND tlo <= t_hit — the front-to-back cut's true bound, probe_r9a).

tests/ray-of-wave constants from this probe x the device's measured
wave_rays + the chip's measured pred_peak (probe_r12b) = per-config
utilization, reported by bench.py (utils/roofline.py).

Run: nohup python scripts/probe_r12c.py > /tmp/probe_r12c.log 2>&1 &
(pure numpy / CPU; no chip needed)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from rust_raytrace_tpu import math3d as m3
from rust_raytrace_tpu.camera import camera_rays, create_viewport
from rust_raytrace_tpu.engine import pick_tile, tile_permutation
from rust_raytrace_tpu.materials import (KIND_MATTE, KIND_REFLECTIVE,
                                         KIND_SOLID)
from rust_raytrace_tpu.ops.intersect_ref import nearest_hit_model
from rust_raytrace_tpu.ops.pages import build_pages, kd_order

F32 = np.float32
RB = 1024
GROUP = 128
PPS = 2


def nearest_hit_fast(O, D, pages, chunk=32768):
    """Brute-force nearest hit, jax-jitted on CPU (XLA vectorizes and
    multithreads what the numpy reference model grinds through serially —
    the first run of this probe spent ~30 min PER WAVE in
    nearest_hit_model at HD).  Same lexicographic (t, id) rule as the
    production kernels; differential-tested against nearest_hit_model on
    the first chunk."""
    import jax
    import jax.numpy as jnp

    PK = jnp.asarray(pages.PK)      # [NP, P, 128]

    @jax.jit
    def run(o, d):                  # o, d: [r, 3]
        o0, o1, o2 = o[:, 0][None], o[:, 1][None], o[:, 2][None]
        d0, d1, d2 = d[:, 0][None], d[:, 1][None], d[:, 2][None]

        def page(carry, pk):        # pk [P, 128]
            best_t, best_id = carry

            def col(lane):
                return pk[:, lane:lane + 1]

            def dot3(lane, r0, r1, r2):
                return col(lane) * r0 + col(lane + 1) * r1 \
                    + col(lane + 2) * r2

            t = (col(12) - dot3(0, o0, o1, o2)) / dot3(0, d0, d1, d2)
            dv0 = dot3(3, o0, o1, o2) + t * dot3(3, d0, d1, d2) - col(13)
            dv1 = dot3(6, o0, o1, o2) + t * dot3(6, d0, d1, d2) - col(14)
            dv2 = dot3(9, o0, o1, o2) + t * dot3(9, d0, d1, d2) - col(15)
            ok = (t >= 0.0) & (dv0 <= 1.0) & (dv1 <= 1.0) & (dv2 <= 1.0)
            tt = jnp.where(ok, t, jnp.inf)
            pmin = jnp.min(tt, axis=0)
            pid = jnp.min(jnp.where(tt == pmin[None], col(16), jnp.inf),
                          axis=0)
            upd = (pmin < best_t) | ((pmin == best_t) & jnp.isfinite(pmin)
                                     & (pid < best_id))
            return (jnp.where(upd, pmin, best_t),
                    jnp.where(upd, pid, best_id)), None

        r = o.shape[0]
        init = (jnp.full((r,), jnp.inf, jnp.float32),
                jnp.zeros((r,), jnp.float32))
        (bt, bi), _ = jax.lax.scan(page, init, PK)
        return bt, bi

    R = O.shape[0]
    bt = np.empty(R, F32)
    bi = np.empty(R, np.int32)
    for s in range(0, R, chunk):
        t, i = run(jnp.asarray(O[s:s + chunk]), jnp.asarray(D[s:s + chunk]))
        bt[s:s + chunk] = np.asarray(t)
        bi[s:s + chunk] = np.asarray(i).astype(np.int32)
    return bt, bi


def slab_hits(pages, O, D, chunk=65536):
    """(ent [R, NP] bool, tlo [R, NP] f32) in ray chunks."""
    R = O.shape[0]
    NP = pages.num_pages
    ent = np.zeros((R, NP), bool)
    tlo_all = np.zeros((R, NP), F32)
    lo = pages.aabb_lo[None]
    hi = pages.aabb_hi[None]
    for s in range(0, R, chunk):
        Oc, Dc = O[s:s + chunk], D[s:s + chunk]
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = 1.0 / Dc[:, None, :]
            inv = np.where(np.isfinite(inv), inv,
                           np.where(Dc[:, None, :] >= 0, 1e30, -1e30))
            t1 = (lo - Oc[:, None, :]) * inv
            t2 = (hi - Oc[:, None, :]) * inv
        tl = np.minimum(t1, t2).max(axis=2)
        th = np.maximum(t1, t2).min(axis=2)
        ent[s:s + chunk] = (tl <= th) & (th >= 0)
        tlo_all[s:s + chunk] = tl
    return ent, tlo_all


def scatter(O, D, t, hid, tris, rng):
    """Vectorized oracle scatter (lambertian for matte, fuzzy mirror for
    reflective — raytrace.rs:278-297) for hit rays."""
    p = O + t[:, None] * D
    n = tris.norm[hid]
    back = np.einsum("rc,rc->r", n, D) > 0
    n = np.where(back[:, None], -n, n)
    kind = tris.materials.kind[hid]
    scat = tris.materials.scattering[hid]

    rv = rng.standard_normal(p.shape).astype(F32)
    rv /= np.maximum(np.linalg.norm(rv, axis=1, keepdims=True), 1e-12)

    # matte: o += 0.001*rv, d = unit(n + rv)
    d_m = n + rv
    d_m /= np.maximum(np.linalg.norm(d_m, axis=1, keepdims=True), 1e-12)
    o_m = p + 0.001 * rv
    # reflective: reflect + scat*rv
    ddot = np.abs(np.einsum("rc,rc->r", D, n))
    refl = D + n * (2 * ddot[:, None])
    d_r = refl + scat[:, None] * rv
    d_r /= np.maximum(np.linalg.norm(d_r, axis=1, keepdims=True), 1e-12)
    o_r = p + 0.001 * d_r

    m = (kind == KIND_MATTE)[:, None]
    return np.where(m, o_m, o_r).astype(F32), \
        np.where(m, d_m, d_r).astype(F32)


def wave0_union(ent, P):
    """Union-kernel work: per-chunk page union x P x RB."""
    R = ent.shape[0]
    pad = (-R) % RB
    if pad:
        ent = np.vstack([ent, np.zeros((pad, ent.shape[1]), bool)])
    u = ent.reshape(-1, RB, ent.shape[1]).any(axis=1).sum(axis=1)  # [NC]
    tests = int(u.sum()) * P * RB
    pages_streamed = int(u.sum())
    return tests, pages_streamed, u.mean()


def bounce_wave(ent, tlo, thit, alive, P, nbanks):
    """Per-lane kernel work for one wave over the CURRENT lane layout.

    ent/tlo: [R, NP] for all prefix lanes (dead lanes masked by alive).
    Returns (tests, mean_eff_alive, groups_live)."""
    R = ent.shape[0]
    NP = ent.shape[1]
    eff = ent & (tlo <= thit[:, None]) & alive[:, None]
    bank = np.arange(NP) // GROUP
    effb = np.zeros((R, nbanks), np.int32)
    for b in range(nbanks):
        effb[:, b] = eff[:, bank == b].sum(axis=1)
    raw = (ent & alive[:, None]).sum(axis=1)
    primary_bank = np.where(
        effb.sum(axis=1) > 0, np.argmax(effb > 0, axis=1), 0)

    tests = 0
    groups_live = 0
    pad = (-R) % RB
    if pad:
        effb = np.vstack([effb, np.zeros((pad, nbanks), np.int32)])
        raw = np.concatenate([raw, np.zeros(pad, np.int32)])
        primary_bank = np.concatenate([primary_bank,
                                       np.zeros(pad, np.int64)])
        alive = np.concatenate([alive, np.zeros(pad, bool)])
    for c0 in range(0, len(raw), RB):
        sl = slice(c0, c0 + RB)
        if not alive[sl].any():
            continue        # chunk_live refresh: whole-chunk skip
        # in-chunk count sort (primary bank, raw count)
        order = np.lexsort((raw[sl], primary_bank[sl]))
        eb = effb[sl][order]
        av = alive[sl][order]
        for g0 in range(0, RB, GROUP):
            gsl = slice(g0, g0 + GROUP)
            if not av[gsl].any():
                continue    # group-level any(valid) skip
            groups_live += 1
            gmax = eb[gsl].max(axis=0)          # [nbanks]
            visits = (2 * np.ceil(gmax / PPS)).astype(int)  # pps pairs
            tests += int(visits.sum()) * GROUP * P
    n_alive = int(alive.sum())
    return tests, float(eff.sum() / max(n_alive, 1)), groups_live


def simulate(name, scene, vp, P, maxdepth=5, weight_cutoff=1 / 512,
             boundaries=(0, 1), seed=3):
    tris = scene.tris
    pages = build_pages(tris, page_size=P, order=kd_order(tris, P))
    NP = pages.num_pages
    nbanks = -(-NP // GROUP)
    print(f"\n== {name}: {len(tris)} tris P={P} NP={NP} banks={nbanks} "
          f"{vp.width}x{vp.height} ==", flush=True)

    O, D = camera_rays(vp)
    tile = pick_tile(vp.width, vp.height)
    perm = tile_permutation(vp.height, vp.width, 1, tile)
    # stream position q holds pixel perm[q] (engine._assemble_host_image)
    O = O[perm]
    D = D[perm]

    rng = np.random.default_rng(seed)
    weight = np.ones(O.shape[0], F32)
    alive = np.ones(O.shape[0], bool)
    rows = []
    for wave in range(maxdepth):
        ent, tlo = slab_hits(pages, O, D)
        t, hid = nearest_hit_fast(O, D, pages)
        thit = np.where(hid != 0, t, np.inf).astype(F32)
        n_alive = int(alive.sum())
        if wave == 0:
            tests, pstream, upc = wave0_union(ent, P)
            dma = pstream * P * 128 * 4
            rows.append((wave, n_alive, tests, dma))
            print(f"  w0: rays {n_alive} union-tests {tests / 1e6:.1f}M "
                  f"({tests / n_alive:.0f}/ray) pages/chunk {upc:.1f} "
                  f"page-DMA {dma / 1e6:.1f} MB", flush=True)
        else:
            tests, mean_eff, gl = bounce_wave(ent, tlo, thit, alive, P,
                                              nbanks)
            rows.append((wave, n_alive, tests, 0))
            print(f"  w{wave}: rays {n_alive} tests {tests / 1e6:.1f}M "
                  f"({tests / max(n_alive, 1):.0f}/ray alive) "
                  f"mean_eff {mean_eff:.2f} live_groups {gl}", flush=True)

        # shade: who survives into the next wave
        hit = (hid != 0) & alive
        kind = tris.materials.kind[hid]
        alpha = tris.materials.alpha[hid]
        cont = hit & (kind != KIND_SOLID)
        weight = np.where(cont, weight * alpha, 0.0).astype(F32)
        cont = cont & (weight > weight_cutoff)
        if wave == maxdepth - 1 or not cont.any():
            alive = cont
            break
        Ow, Dw = scatter(O, D, t, np.where(hit, hid, 0), tris, rng)
        O = np.where(cont[:, None], Ow, O).astype(F32)
        D = np.where(cont[:, None], Dw, D).astype(F32)
        alive = cont
        if wave in boundaries:
            # compaction: pack alive rays to a prefix, stream order kept
            idx = np.argsort(~alive, kind="stable")
            O, D, weight, alive = O[idx], D[idx], weight[idx], alive[idx]
            n = int(alive.sum())
            npad = -(-n // RB) * RB
            O, D = O[:npad], D[:npad]
            weight, alive = weight[:npad], alive[:npad]

    total = sum(r[2] for r in rows)
    print(f"  TOTAL tests {total / 1e6:.1f}M  per primary ray "
          f"{total / len(perm):.0f}", flush=True)
    print("  TESTS_PER_WAVE_RAY:",
          [round(r[2] / max(r[1], 1), 1) for r in rows], flush=True)
    return rows


def main():
    from rust_raytrace_tpu.models import multi, teapot

    # HD, not lower: wave-0 union tests/ray are resolution-SENSITIVE (a
    # chunk's camera tile covers 4x the solid angle at half the
    # resolution -> looser page unions: 569/ray at 640x360 vs 123/ray at
    # HD for teapot).  HD is the closest tractable stand-in for the
    # bench's 2k (whose tiles are tighter still, so utilization computed
    # from HD constants READS HIGH for wave 0 — stated in PERF.md).
    scene, _ = teapot.build(resolution="2k")
    vp = create_viewport((1280, 720), (1.6, 0.9), (2.0, 0.0, 0.0),
                         m3.unit(m3.vec(0.0, 0.0, 1.0)), 90.0, 0.0, 5, 1)
    simulate("teapot_hd", scene, vp, P=56)

    scene, _ = multi.build(resolution="2k")
    simulate("multi_hd", scene, vp, P=56)

    from rust_raytrace_tpu.geometry import make_sphere
    from rust_raytrace_tpu.materials import matte
    from rust_raytrace_tpu.scene import assemble
    s = make_sphere((0.0, 0.0, 10.0), 4.0, (224, 224),
                    matte(m3.make_color((252, 119, 0)), 0.2), 0.0)
    sc = assemble([s])
    vps = create_viewport((640, 360), (1.6, 0.9), (0.0, 0.0, 0.0),
                          m3.unit(m3.vec(0.0, 0.0, 1.0)), 90.0, 0.0, 5, 1)
    simulate("synthetic_100k_sd", sc, vps, P=112)


if __name__ == "__main__":
    main()
