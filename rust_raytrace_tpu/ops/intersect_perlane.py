"""Per-lane (per-ray) page traversal — the bounce-wave nearest-hit kernel.

The chunk-union trace (ops/intersect_pallas.py) visits, for EVERY ray of a
chunk, the union of all pages any chunk ray touches.  Primary-ray chunks are
coherent camera tiles, so the union is tight (~5 pages); compacted BOUNCE
chunks mix scattered directions and their unions approach the whole page set
(~90 of 105 teapot pages -> ~5800 triangle tests per ray where each ray's own
slab tests select only ~6 pages -> ~400 tests).

This kernel gives each ray its PERSONAL page list, at the cost of per-lane
dynamic indexing.  The enabling Mosaic fact (measured on-chip this round):
`tpu.dynamic_gather` lowers iff the gathered dimension fits ONE vreg — 128
lanes.  So the page axis is capped at 128 (NP <= 128; the engine picks the
page size accordingly or falls back to the union kernel), the whole packed
scene is kept VMEM-resident as a [rows, 128] PAGES-ON-LANES table, and rays
are processed in groups of 128:

  1. per-lane slab test of all 128 page AABBs ([pages, rays] tile, exactly
     the packet cull's math at ray granularity) -> a per-lane WORK matrix
     hit[page, ray] plus the slab entry distances tlo[page, ray];
  2. loop while any work remains: each lane priority-encodes its first
     remaining page (min page index down the sublane axis), gathers that
     page's entire triangle table column ([17*P, 128] same-shape
     take_along_axis), runs the standard incenter/half-plane predicate on
     [P, 128] tiles, and folds a lexicographic (t, id) running best; the
     tested page is cleared from the work matrix, and so is EVERY page
     whose slab entry lies beyond the lane's current best hit
     (tlo > best_t) — a per-lane front-to-back cut, with the next page
     chosen greedily by nearest slab entry (the reference's traversal
     order, raytrace.rs:941-947), so the loop runs to each
     group's surviving-page count, not its raw slab-hit count.  (An
     explicit in-kernel bitonic sort by entry distance measured ~12%
     SLOWER than index order — docs/PERF.md round-2 finding #6; this cut
     keeps index order and still realizes most of the early-exit win.)
     Shadow rays (`any_hit`) retire a lane's remaining pages as soon as
     ANY occluder is found — occlusion needs no nearest-hit.
  3. the winner's normal and material are extracted by ONE more gather of
     the winner page plus an id-match masked reduction — no ray-scale
     gathers, same output contract as the union kernel (rows ROW_*).

The structural reference is the per-ray ordered worklist of the reference's
GPU path (get_all_objects_for_ray, raytrace.rs:1052-1077; pages windowed at
cuda_raytrace.rs:231-253) — rebuilt here with the octree replaced by flat
KD-page slab tests (ops/pages.kd_order), which measure tighter than both
the octree leaves and the round-1 Morton pages for these scene sizes.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .compact import (STATE_ROWS, _gather_lanes, _onehot, _permute,
                      _src_index_from_onehot)
from .pages import PACK_LANES, PageTables
from .shade import _shade_state_rows, scatter_rv, shadow_uvs

F32 = jnp.float32
BF16 = jnp.bfloat16
BIG = 1e30

GROUP = 128           # rays per gather group (= max gatherable lanes)
N_INT = 17            # intersect features: n(3) s0..s2(9) nc(1) s*c(3) id(1)
N_SHD = 7             # shade features: et kind color(3) alpha scat

#: in-chunk count-sort class bounds: lanes are permuted inside each chunk so
#: every 128-ray gather group holds rays of ~one count class — the traversal
#: loop runs to each group's max page count, so mixing a 2-page ray with an
#: 18-page ray makes the cheap lane pay the expensive lane's steps.  Unlike
#: bucketed COMPACTION (which pays 128-lane alignment per (chunk, bucket) and
#: measured 2x slower end-to-end), the in-chunk sort has no padding cost, so
#: finer classes are strictly better; the masks/ranks matmul grows only by
#: rows.  Dead lanes sort last (count forced huge).
#: pages tested per while-loop iteration (nearest-hit mode): amortizes
#: the per-step selection/bookkeeping over more gathers; bit-exact for
#: any value (the cross-page cut is applied between the in-step pages).
#: Chip sweep (probe_r3s): 2 -> 112.4 ms teapot_2k vs 1 -> 114.4 (the
#: round-2 "two pages modelled wash" underestimated the bookkeeping
#: share).
PAGES_PER_STEP = 2

SORT_THRESH = (1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 10.0, 12.0, 15.0,
               19.0, 24.0)

#: output rows (identical contract to ops.intersect_pallas) + the shared
#: single-source hit predicate (the bit-exactness contract's arithmetic)
from .intersect_pallas import (ROW_ALPHA, ROW_COLOR, ROW_ENC, ROW_ID,
                               ROW_NORM, ROW_SCAT, ROW_T, TRACE_ROWS,
                               packed_hit_predicate)


#: max banks: caps the VMEM-resident table at NB*(N_INT+N_SHD)*P*128 f32
#: (~11 MB at P=56, NB=16) and the scene at NB*128 pages (~115k tris at
#: P=56) — the scale-free range VERDICT r2 asked for; beyond it the engine
#: grows the page size again.
MAX_BANKS = 16


def build_perlane_tables(pages: PageTables):
    """Rearrange PK [NP, P, 128] into pages-on-lanes gather tables.

    Pages are grouped into NB = ceil(NP/128) BANKS of <= 128 pages each
    (tpu.dynamic_gather lowers only within one 128-lane vreg, so per-lane
    page selection is bank-local; the traversal loops over banks, carrying
    the running winner across — the two-level analog of the reference's
    depth-10 octree, raytrace.rs:790-845, for scenes whose page count
    exceeds one vreg).  KD page order (ops/pages.kd_order) makes banks
    spatially compact, so a ray's pages cluster into 1-2 banks.

    Returns (PLT_I [NB*N_INT*P, 128], PLT_S [NB*N_SHD*P, 128],
    AB [NB*128, 128]) as numpy arrays; AB rows b*128..b*128+127 hold bank
    b's page AABBs: lanes 0..2 = lo, 3..5 = hi, 6 = page-valid.
    """
    PK = pages.PK
    NP, P, _ = PK.shape
    NB = -(-NP // GROUP)
    assert NB <= MAX_BANKS, \
        f"per-lane traversal caps at {MAX_BANKS * GROUP} pages, got {NP}"

    plt_i = np.zeros((NB * N_INT * P, GROUP), np.float32)
    plt_s = np.zeros((NB * N_SHD * P, GROUP), np.float32)
    ab = np.zeros((NB * GROUP, PACK_LANES), np.float32)

    def table(pk_b, lane0, nf):
        npb = pk_b.shape[0]
        t = np.transpose(pk_b[:, :, lane0:lane0 + nf], (2, 1, 0))
        return t.reshape(nf * P, npb)

    for b in range(NB):
        pk_b = PK[b * GROUP:(b + 1) * GROUP]
        npb = pk_b.shape[0]
        plt_i[b * N_INT * P:(b + 1) * N_INT * P, :npb] = table(pk_b, 0, N_INT)
        plt_s[b * N_SHD * P:(b + 1) * N_SHD * P, :npb] = \
            table(pk_b, N_INT, N_SHD)
        ab[b * GROUP:b * GROUP + npb, 0:3] = \
            pages.aabb_lo[b * GROUP:b * GROUP + npb]
        ab[b * GROUP:b * GROUP + npb, 3:6] = \
            pages.aabb_hi[b * GROUP:b * GROUP + npb]
        ab[b * GROUP:b * GROUP + npb, 6] = 1.0
    return plt_i, plt_s, ab


def _slab(ab_ref, o3, d3):
    """Per-lane slab test vs all page AABBs: (tlo, thi, page_ok),
    each [pages, rays]."""
    tlo = None
    thi = None
    for k in range(3):
        d_k = d3[k:k + 1, :]
        inv = jnp.where(d_k != 0.0, 1.0 / d_k,
                        jnp.where(d_k >= 0.0, F32(BIG), F32(-BIG)))
        t1 = (ab_ref[:, k:k + 1] - o3[k:k + 1, :]) * inv
        t2 = (ab_ref[:, k + 3:k + 4] - o3[k:k + 1, :]) * inv
        alo = jnp.minimum(t1, t2)
        ahi = jnp.maximum(t1, t2)
        tlo = alo if tlo is None else jnp.maximum(tlo, alo)
        thi = ahi if thi is None else jnp.minimum(thi, ahi)
    page_ok = ab_ref[:, 6:7] != 0.0
    return tlo, thi, page_ok


def _trace_chunk(plt, plts, sub_p, ab, o_v, d_v, a_v, excl_v, dst, P,
                 RB, any_hit, sort_lanes, nb: int = 1, sb=None,
                 klt=None, sub_f=None, permute_gather=None):
    """Winner rows for one chunk written into `dst` (a [16, RB] ref).

    With sort_lanes, rows land in COUNT-SORTED lane order and the per-lane
    destination map `dest` [1, RB] is returned so the caller can invert the
    permutation (out[l] = sorted[dest[l]], a tile-blocked gather);
    otherwise rows are in input order and None is returned.
    """
    if not sort_lanes:
        dst[:] = jnp.zeros_like(dst)
        for g in range(RB // GROUP):
            sl = slice(g * GROUP, (g + 1) * GROUP)
            _group(plt, plts, sub_p, o_v[:, sl], d_v[:, sl], a_v[:, sl],
                   excl_v[:, sl] if excl_v is not None else None,
                   ab, dst, sl, P, any_hit, nb, sb)
        return None

    # --- in-chunk count sort ---
    # 1. per-lane page counts (slab only; recomputed per group below on
    #    the permuted lanes — cheaper than permuting the hit matrices),
    #    summed over banks; for nb > 1 also each lane's PRIMARY bank
    #    (first bank holding any of its pages) — the sort key leads with
    #    it so gather groups become bank-homogeneous and the per-bank
    #    while-loops degenerate to empty for every other bank (without
    #    this, a mixed group pays every bank's max step count: multi_2k
    #    measured 2.97x teapot per-ray before, scripts/probe_r3c).
    # (whole-chunk [128, RB] slab broadcasts instead of per-group
    # [128, 128] tiles: identical flops, 8x fewer op instances for
    # Mosaic to schedule)
    cnt = None
    pball = None
    empty_so_far = None
    cbank = []      # per-bank [1, RB] fine counts (nb > 1)
    for b in range(nb):
        ab_b = ab[b * GROUP:(b + 1) * GROUP]
        tlo, thi, page_ok = _slab(ab_b, o_v, d_v)    # [128, RB]
        ent = (tlo <= thi) & (thi >= 0.0) & page_ok
        c = jnp.sum(jnp.where(ent, F32(1.0), F32(0.0)),
                    axis=0, keepdims=True)           # [1, RB]
        cnt = c if cnt is None else cnt + c
        if nb > 1:
            cbank.append(c)
            empty_b = (c == 0.0).astype(F32)
            empty_so_far = empty_b if empty_so_far is None \
                else empty_so_far * empty_b
            pball = empty_so_far if pball is None \
                else pball + empty_so_far
    alive_row = a_v[0:1, :]
    cnt_eff = jnp.where(alive_row != 0.0, cnt, F32(1e9))  # gaps last

    # 2. class masks + within-class ranks (one lower-triangular matmul,
    #    exact: 0/1 bf16 products, f32 accumulation)
    nbk = len(SORT_THRESH) + 1
    qsum = jnp.zeros_like(cnt)
    for thr in SORT_THRESH:
        qsum = qsum + jnp.where(cnt_eff > F32(thr), F32(1.0), F32(0.0))
    if nb > 1:
        # pball [1, RB]: each lane's leading-empty-bank count = its
        # primary bank index (computed in the slab pass above)
        pb_eff = jnp.where(alive_row != 0.0, pball, F32(nb))
        qsum = jnp.minimum(pb_eff, F32(nb)) * F32(nbk) + qsum
        nbk = (nb + 1) * nbk
    masks = jnp.concatenate(
        [jnp.where(qsum == F32(q), F32(1.0), F32(0.0))
         for q in range(nbk)], axis=0)               # [nbk, RB]
    if klt is None:
        # no persistent scratch (direct callers): build the [RB, RB]
        # helpers inline; kernels pass the grid-step-0 scratch instead
        # (the iota builds cost ~us per chunk at RB = 1024)
        subq = jax.lax.broadcasted_iota(jnp.int32, (RB, RB), 0)
        laneq = jax.lax.broadcasted_iota(jnp.int32, (RB, RB), 1)
        klt = (laneq < subq).astype(BF16)
        sub_f = subq.astype(F32)
    ranks = jax.lax.dot_general(
        masks.astype(BF16), klt, (((1,), (1,)), ((), ())),
        preferred_element_type=F32)                  # [nbk, RB]
    tot = jnp.sum(masks, axis=1, keepdims=True)      # [nbk, 1]

    # 3. destination lane = class base + within-class rank -> one-hot
    dest = jnp.zeros_like(cnt)
    base = F32(0.0)
    for q in range(nbk):
        dest = dest + masks[q:q + 1] * (base + ranks[q:q + 1])
        base = base + tot[q, 0]
    M = _onehot(dest, jnp.ones_like(dest), RB, sub_f)   # [dst, src] bf16

    # 4. permute the 8 input rows.  Two bit-exact forms, chosen by bank
    #    count (both measured on chip, probe_r6g): multi-bank kernels use
    #    the source-index GATHER (one tiny matmul recovers srcidx, rows
    #    move as verbatim bits — multi 243.8 -> 238.8 ms, synthetic
    #    231.4 -> 230.2); the 1-bank kernel keeps the byte-split one-hot
    #    MXU matmul (teapot 104.7 vs 106.8 with the gather: that kernel
    #    is VPU-bound, so moving permute work from the idle MXU onto the
    #    VPU costs more than the MACs saved).
    in8 = jnp.concatenate(
        [o_v, d_v, alive_row,
         excl_v[0:1, :] if excl_v is not None else alive_row], axis=0)
    use_gather = (nb > 1) if permute_gather is None else permute_gather
    if use_gather:
        srcidx = _src_index_from_onehot(M, RB)
        p8 = _gather_lanes(in8, srcidx, RB)           # [8, RB]
    else:
        p8 = _permute(in8, M, compacting=True, mode="bytes")

    # 5. trace the count-uniform groups into scratch.  For nb > 1 the
    # per-bank count matrix rides the SAME permutation (the same gather —
    # bits verbatim) and becomes the per-group bank GATE: a post-sort
    # group only runs the banks some member lane has pages in —
    # bank-homogeneous groups skip nearly every other bank's slab +
    # while-loop.
    bankcnt = None
    if nb > 1:
        C = jnp.concatenate(cbank, axis=0)           # [nb, RB]
        if use_gather:
            bankcnt = _gather_lanes(C, srcidx, RB)   # [nb, RB] permuted
        else:
            bankcnt = jax.lax.dot_general(
                C.astype(BF16), M, (((1,), (1,)), ((), ())),
                preferred_element_type=F32)
    dst[:] = jnp.zeros_like(dst)
    for g in range(RB // GROUP):
        sl = slice(g * GROUP, (g + 1) * GROUP)
        _group(plt, plts, sub_p, p8[0:3, sl], p8[3:6, sl], p8[6:7, sl],
               p8[7:8, sl] if excl_v is not None else None,
               ab, dst, sl, P, any_hit, nb, sb,
               bankcnt[:, sl] if bankcnt is not None else None)
    return dest


def _sort_scratch_build(klt_s, subf_s, RB: int, sort_lanes: bool):
    """Persistent [RB, RB] count-sort helpers, built ONCE at grid step 0
    (strict-lower bf16 matrix for rank matmuls + f32 sublane iota for
    one-hot builds — the per-chunk iota builds they replace measure ~us
    each at RB = 1024; same pattern as ops/compact._build_iota_scratch)."""
    if not sort_lanes:
        return
    @pl.when(pl.program_id(0) == 0)
    def _():
        subq = jax.lax.broadcasted_iota(jnp.int32, (RB, RB), 0)
        laneq = jax.lax.broadcasted_iota(jnp.int32, (RB, RB), 1)
        klt_s[:] = (laneq < subq).astype(BF16)
        subf_s[:] = subq.astype(F32)


def _kernel(flags_ref, o_ref, d_ref, a_ref, excl_ref, ab_ref, plt_ref,
            plts_ref, out_ref, sout, sgate, klt_s, subf_s, *,
            page_size: int, ray_chunk: int, exclude_id: bool, any_hit: bool,
            sort_lanes: bool, nb: int, permute_gather=None):
    P = page_size
    RB = ray_chunk
    row = jax.lax.rem(pl.program_id(0), 8)
    out_ref[:] = jnp.zeros_like(out_ref)
    _sort_scratch_build(klt_s, subf_s, RB, sort_lanes)

    @pl.when(flags_ref[row, 0] != 0)
    def _busy():
        plt = plt_ref[:]                                 # [nb*17P, 128]
        plts = plts_ref[:]                               # [nb*7P, 128]
        ab = ab_ref[:]                                   # [nb*128, 128]
        sub_p = jax.lax.broadcasted_iota(jnp.int32, (GROUP, GROUP), 0)
        dest = _trace_chunk(plt, plts, sub_p, ab, o_ref[:], d_ref[:],
                            a_ref[:], excl_ref[:] if exclude_id else None,
                            sout if sort_lanes else out_ref, P, RB, any_hit,
                            sort_lanes, nb, sgate,
                            klt_s[:] if sort_lanes else None,
                            subf_s[:] if sort_lanes else None,
                            permute_gather=permute_gather)
        if sort_lanes:
            # inverse permutation puts winner rows back in lane order:
            # out[l] = sorted[dest[l]] — a tile-blocked gather (bits
            # verbatim; safe for the +-inf winner-t row)
            out_ref[:] = _gather_lanes(sout[:], dest, RB)


def _kernel_fused(flags_ref, seed_ref, light_ref, st_ref, ab_ref, plt_ref,
                  plts_ref, out_ref, sout, sshd, sgate, klt_s, subf_s, *,
                  page_size: int, ray_chunk: int, fixed_rng: bool,
                  weight_cutoff: float, sort_lanes: bool, nb: int,
                  has_lights: bool, permute_gather=None):
    """Fused trace + shade: one grid step traces a chunk's rays AND applies
    the wave's shading/scatter/state update while the winner rows are still
    in VMEM.  The separate shade kernel costs ~5 ms/wave in block DMA alone
    (every [16, R] block moves in and out regardless of chunk skipping);
    here the rows never leave the chip memory hierarchy.  Input/output are
    ops.compact state arrays [16, R]; dead chunks pass through.

    has_lights additionally fuses the SHADOW FEELER (the commented
    reference design, raytrace.rs:600-610, 1203-1224) between trace and
    shade: the winner rows stay in VMEM, each hit lane builds its jittered
    ray to the light (light_ref SMEM row: ox oy oz len2) and runs the same
    per-lane traversal in any_hit mode with its own triangle excluded —
    the unfused path paid a separate full trace kernel + state round trip
    per wave for this (~2x wall on lights configs, docs/PERF.md sweep)."""
    P = page_size
    RB = ray_chunk
    pid = pl.program_id(0)
    row = jax.lax.rem(pid, 8)
    live = flags_ref[row, 0] != 0
    _sort_scratch_build(klt_s, subf_s, RB, sort_lanes)

    @pl.when(jnp.logical_not(live))
    def _skip():
        out_ref[:] = st_ref[:]

    @pl.when(live)
    def _busy():
        st = st_ref[:]                                   # [16, RB]
        plt = plt_ref[:]
        plts = plts_ref[:]
        ab = ab_ref[:]
        sub_p = jax.lax.broadcasted_iota(jnp.int32, (GROUP, GROUP), 0)
        dest = _trace_chunk(plt, plts, sub_p, ab, st[0:3], st[3:6],
                            st[7:8], None, sout, P, RB, False, sort_lanes,
                            nb, sgate,
                            klt_s[:] if sort_lanes else None,
                            subf_s[:] if sort_lanes else None,
                            permute_gather=permute_gather)
        rows = _gather_lanes(sout[:], dest, RB) if sort_lanes else sout[:]
        rv0, rv1, rv2 = scatter_rv(seed_ref[0, 0], seed_ref[0, 1], pid, RB,
                                   fixed_rng)
        shd = None
        if has_lights:
            # --- fused shadow feeler (mirrors engine._shadow_mask
            # op-for-op so fused == unfused bit-exactly under FixedRng) ---
            alive_row = st[7:8]
            hid = rows[ROW_ID:ROW_ID + 1]
            hitm = (alive_row != 0.0) & (hid != 0.0)     # [1, RB]
            t_row = rows[ROW_T:ROW_T + 1]
            tm = jnp.where(hitm, t_row, 0.0)
            p0 = st[0:1] + tm * st[3:4]
            p1 = st[1:2] + tm * st[4:5]
            p2 = st[2:3] + tm * st[5:6]
            n0 = rows[ROW_NORM:ROW_NORM + 1]
            n1 = rows[ROW_NORM + 1:ROW_NORM + 2]
            n2 = rows[ROW_NORM + 2:ROW_NORM + 3]
            back = rows[ROW_ENC:ROW_ENC + 1] >= 8.0
            nf0 = jnp.where(back, -n0, n0)
            nf1 = jnp.where(back, -n1, n1)
            nf2 = jnp.where(back, -n2, n2)
            u3, u1 = shadow_uvs(seed_ref[0, 0], seed_ref[0, 1], pid, RB,
                                fixed_rng)
            lx = light_ref[0, 0]
            ly = light_ref[0, 1]
            lz = light_ref[0, 2]
            ll = light_ref[0, 3]
            a0 = lx + u3[0:1] * ll - p0
            a1 = ly + u3[1:2] * ll - p1
            a2 = lz + u3[2:3] * ll - p2
            inv = jax.lax.rsqrt(a0 * a0 + a1 * a1 + a2 * a2)
            sd0, sd1, sd2 = a0 * inv, a1 * inv, a2 * inv
            off = F32(0.005) * (u1 + F32(1.0))
            so0 = p0 + nf0 * off
            so1 = p1 + nf1 * off
            so2 = p2 + nf2 * off
            hmf = hitm.astype(F32)
            so3 = jnp.concatenate(
                [jnp.where(hitm, so0, 0.0), jnp.where(hitm, so1, 0.0),
                 jnp.where(hitm, so2, 0.0)], axis=0)
            sd3 = jnp.concatenate(
                [jnp.where(hitm, sd0, 0.0), jnp.where(hitm, sd1, 0.0),
                 jnp.where(hitm, sd2, 0.0)], axis=0)
            excl = jnp.where(hitm, hid, 0.0)
            sshd[:] = jnp.zeros_like(sshd)
            for g in range(RB // GROUP):
                sl = slice(g * GROUP, (g + 1) * GROUP)
                _group(plt, plts, sub_p, so3[:, sl], sd3[:, sl],
                       hmf[:, sl], excl[:, sl], ab, sshd, sl, P, True, nb)
            sid = sshd[ROW_ID:ROW_ID + 1, :]
            shd = (hitm & (sid != 0.0)).astype(F32)
        out_ref[:] = _shade_state_rows(st, rows, rv0, rv1, rv2, shd,
                                       weight_cutoff)


def _group(plt, plts, sub_p, o3, d3, a1, excl, ab, out_ref, sl, P,
           any_hit, nb: int = 1, sb=None, bankcnt=None):
    """Trace one 128-ray group against its per-lane page lists.

    nb > 1: pages live in nb banks of <= 128 (the dynamic-gather vreg cap);
    the traversal visits banks in index order, carrying the running (t, id)
    winner across — the cross-bank `tlo <= best_t` cut prunes later banks'
    pages exactly like the in-bank front-to-back cut (bit-exact: any
    triangle in a dropped page has t >= tlo > best_t).  With `bankcnt`
    ([nb, 128] per-lane fine page counts, permuted alongside the lanes by
    the in-chunk sort) and the `sb` scratch, each bank's slab + while-loop
    runs ONLY if some lane of the group has pages there — post-sort groups
    are bank-homogeneous, so this skips nearly every other bank.  (An
    earlier bank-AABB-based gate fired for most banks — secondary entries
    span banks — and measured a wash; the page-count gate is exact.)
    """
    valid = a1[0:1, :] != 0.0                            # [1, 128]

    @pl.when(jnp.any(valid))
    def _():
        page_f2 = sub_p.astype(F32)                      # [128, 128] page ids

        o0, o1, o2 = (o3[k:k + 1, :] for k in range(3))
        d0, d1, d2 = (d3[k:k + 1, :] for k in range(3))

        def feat(G, f):
            return G[f * P:(f + 1) * P, :]               # [P, 128]

        def predicate(G, has):
            # single-sourced hit arithmetic (the bit-exactness anchor):
            # feature f of a gathered page column lives at rows f*P..f*P+P
            return packed_hit_predicate(
                lambda f: feat(G, f), (o0, o1, o2), (d0, d1, d2), has=has,
                excl=excl[0:1, :] if excl is not None else None)

        def bank_pass(b, best, gate_cut):
            """Slab + while-loop for bank b from winner state `best`."""
            best_t, best_id, best_pg = best
            ab_b = ab[b * GROUP:(b + 1) * GROUP]
            plt_b = plt[b * N_INT * P:(b + 1) * N_INT * P]
            tlo, thi, page_ok = _slab(ab_b, o3, d3)
            hit = (tlo <= thi) & (thi >= 0.0) & valid & page_ok
            if gate_cut:
                # cross-bank front-to-back cut + any_hit early exit
                hit = hit & (tlo <= best_t)
                if any_hit:
                    hit = hit & (best_id == 0.0)
            hit_f0 = hit.astype(F32)

            def select_nearest(hit_f, tkey_mask_pages=()):
                """Per-lane nearest-entry remaining page: (has, pidx, ktlo).
                The reference's traversal order (raytrace.rs:941-947);
                greedy per-step min — an explicit bitonic presort measured
                ~12% slower (docs/PERF.md finding #6).  Sentinel is +inf:
                a hit page's tlo is finite (but can exceed any fixed BIG
                when an axis has d == 0).  tkey_mask_pages: per-lane page
                ids already picked this step, excluded from the min."""
                tkey = jnp.where(hit_f > 0.0, tlo, jnp.inf)
                for mp in tkey_mask_pages:
                    tkey = jnp.where(page_f2 == mp, jnp.inf, tkey)
                kmin = jnp.min(tkey, axis=0, keepdims=True)
                has = kmin < jnp.inf
                pidx = jnp.where(
                    has,
                    jnp.min(jnp.where(tkey == kmin, page_f2, F32(GROUP)),
                            axis=0, keepdims=True),
                    F32(GROUP))                          # [1, 128]
                return has, pidx, kmin

            def test_page(has, pidx, best_t, best_id, best_pg):
                """Gather + predicate + lexicographic winner update for one
                selected page per lane."""
                page = jnp.where(has, pidx, 0.0)
                idx = jnp.broadcast_to(page.astype(jnp.int32), plt_b.shape)
                G = jnp.take_along_axis(plt_b, idx, axis=1)   # [17P, 128]
                t, ok, ids, _, _ = predicate(G, has)
                tt = jnp.where(ok, t, jnp.inf)
                pmin = jnp.min(tt, axis=0, keepdims=True)
                pid = jnp.min(jnp.where(tt == pmin, ids, jnp.inf), axis=0,
                              keepdims=True)
                upd = (pmin < best_t) | ((pmin == best_t) & ~jnp.isinf(pmin)
                                         & (pid < best_id))
                best_t = jnp.where(upd, pmin, best_t)
                best_id = jnp.where(upd, pid, best_id)
                best_pg = jnp.where(upd, page + F32(b * GROUP), best_pg)
                return best_t, best_id, best_pg

            def body(carry, tlo=tlo, plt_b=plt_b, b=b):
                work, hit_f, best_t, best_id, best_pg = carry
                del work
                if any_hit:
                    # occlusion: any order works — cheapest selection
                    pidx = jnp.min(
                        jnp.where(hit_f > 0.0, page_f2, F32(GROUP)),
                        axis=0, keepdims=True)           # [1, 128]
                    has = pidx < F32(GROUP)
                    best_t, best_id, best_pg = test_page(
                        has, pidx, best_t, best_id, best_pg)
                    keep = (page_f2 != pidx) & (tlo <= best_t) \
                        & (best_id == 0.0)
                    hit_f = hit_f * keep.astype(F32)
                    return (jnp.max(hit_f), hit_f, best_t, best_id,
                            best_pg)
                # nearest-hit: PAGES_PER_STEP pages per iteration — the
                # second page's cross-page cut (its entry beyond the
                # post-first-page best) reproduces exactly what the
                # one-page loop would do at its own step, so the winner
                # is bit-identical for any PAGES_PER_STEP.
                hasA, pidxA, _ = select_nearest(hit_f)
                best_t, best_id, best_pg = test_page(
                    hasA, pidxA, best_t, best_id, best_pg)
                extra = [pidxA]
                for _ in range(PAGES_PER_STEP - 1):
                    # each later page's select masks all earlier in-step
                    # picks; its entry-beyond-best gate reproduces exactly
                    # what the one-page loop would do at its own step
                    hasB, pidxB, ktloB = select_nearest(hit_f, extra)
                    hasB = hasB & (ktloB <= best_t)
                    best_t, best_id, best_pg = test_page(
                        hasB, pidxB, best_t, best_id, best_pg)
                    # pidxB is GROUP for lanes with nothing left (the
                    # clear below is a no-op there); a lane whose B was
                    # cut by the gate clears it too — the one-page loop
                    # would drop it at its own step by the same rule
                    extra.append(pidxB)
                # retire the tested page(s); drop pages that can no longer
                # win (slab entry beyond the current best — any triangle
                # in such a page has t >= tlo > best_t: bit-exact drop)
                keep = tlo <= best_t
                for p in extra:
                    keep = keep & (page_f2 != p)
                hit_f = hit_f * keep.astype(F32)
                return jnp.max(hit_f), hit_f, best_t, best_id, best_pg

            def cond(carry):
                return carry[0] > 0.0

            _, _, best_t, best_id, best_pg = jax.lax.while_loop(
                cond, body,
                (jnp.max(hit_f0), hit_f0, best_t, best_id, best_pg))
            return best_t, best_id, best_pg

        def extract(b, best_t, best_id, best_pg):
            """Winner-state payload rows from bank b's tables (masked to
            lanes whose winner lives in bank b)."""
            hitl = best_id != 0.0                        # [1, 128]
            if nb == 1:
                in_b = hitl
                local = best_pg
            else:
                in_b = hitl & (best_pg >= F32(b * GROUP)) \
                    & (best_pg < F32((b + 1) * GROUP))
                local = jnp.clip(best_pg - F32(b * GROUP), 0.0,
                                 F32(GROUP - 1))
            plt_b = plt[b * N_INT * P:(b + 1) * N_INT * P]
            plts_b = plts[b * N_SHD * P:(b + 1) * N_SHD * P]
            idxw = jnp.broadcast_to(local.astype(jnp.int32), plt_b.shape)
            Gw = jnp.take_along_axis(plt_b, idxw, axis=1)
            idxs = jnp.broadcast_to(local.astype(jnp.int32), plts_b.shape)
            Gs = jnp.take_along_axis(plts_b, idxs, axis=1)    # [7P, 128]

            t, ok, ids, md_n, (dv0, dv1, dv2) = predicate(Gw, in_b)
            win = (ids == best_id) & in_b                # [P, 128] one-hot
            wf = win.astype(F32)

            def ext(v):
                return jnp.sum(wf * v, axis=0, keepdims=True)

            def featS(f):
                return Gs[f * P:(f + 1) * P, :]

            inv_et = 1.0 - featS(0)                      # 1 - edge_thickness
            edge = (dv0 > inv_et) | (dv1 > inv_et) | (dv2 > inv_et)
            back = md_n > 0.0
            enc = featS(1) + 4.0 * edge.astype(F32) + 8.0 * back.astype(F32)
            return [ext(feat(Gw, 0)), ext(feat(Gw, 1)), ext(feat(Gw, 2)),
                    ext(enc), ext(featS(2)), ext(featS(3)), ext(featS(4)),
                    ext(featS(5)), ext(featS(6))]

        PAYLOAD = [ROW_NORM, ROW_NORM + 1, ROW_NORM + 2, ROW_ENC,
                   ROW_COLOR, ROW_COLOR + 1, ROW_COLOR + 2, ROW_ALPHA,
                   ROW_SCAT]

        init_t = jnp.where(valid, jnp.inf, -jnp.inf)
        zero = jnp.zeros_like(init_t)

        if nb == 1 or bankcnt is None or sb is None:
            # register-carried path (nb == 1 fast path; ungated bank loop
            # for callers without a permuted count gate, e.g. the fused
            # shadow pass)
            best = (init_t, zero, zero)
            for b in range(nb):
                best = bank_pass(b, best, gate_cut=(b > 0))
            best_t, best_id, best_pg = best
            rows_acc = None
            for b in range(nb):
                rows_b = extract(b, best_t, best_id, best_pg)
                rows_acc = rows_b if rows_acc is None else \
                    [a + v for a, v in zip(rows_acc, rows_b)]
            out_ref[ROW_T:ROW_T + 1, sl] = best_t
            out_ref[ROW_ID:ROW_ID + 1, sl] = best_id
            for r, v in zip(PAYLOAD, rows_acc):
                out_ref[r:r + 1, sl] = v
            return

        # --- gated banked path: winner rides the sb scratch rows so each
        # bank's pass can live inside a pl.when region ---
        sb[0:1, sl] = init_t
        sb[1:2, sl] = zero
        sb[2:3, sl] = zero
        gates = [jnp.any(bankcnt[b:b + 1, :] > 0.0) for b in range(nb)]
        for b in range(nb):
            @pl.when(gates[b])
            def _bank(b=b):
                best = (sb[0:1, sl], sb[1:2, sl], sb[2:3, sl])
                bt, bi, bp = bank_pass(b, best, gate_cut=True)
                sb[0:1, sl] = bt
                sb[1:2, sl] = bi
                sb[2:3, sl] = bp

        best_t = sb[0:1, sl]
        best_id = sb[1:2, sl]
        best_pg = sb[2:3, sl]
        out_ref[ROW_T:ROW_T + 1, sl] = best_t
        out_ref[ROW_ID:ROW_ID + 1, sl] = best_id
        for r in PAYLOAD:
            out_ref[r:r + 1, sl] = jnp.zeros_like(best_t)
        for b in range(nb):
            @pl.when(gates[b])
            def _extract(b=b):
                rows_b = extract(b, best_t, best_id, best_pg)
                for r, v in zip(PAYLOAD, rows_b):
                    out_ref[r:r + 1, sl] = out_ref[r:r + 1, sl] + v


@functools.partial(jax.jit, static_argnames=("page_size", "ray_chunk",
                                             "interpret", "any_hit",
                                             "sort_lanes",
                                             "permute_gather"))
def trace_perlane_pallas(OT, DT, alive, plt_i, plt_s, ab, page_size: int,
                         ray_chunk: int, chunk_live=None,
                         interpret: bool = False, excl=None,
                         any_hit: bool = False, sort_lanes=None,
                         permute_gather=None):
    """Per-lane nearest hit + winner state.  Same output contract as
    trace_chunks_pallas: OUT [16, R] (rows ROW_*).

    OT, DT: [3, R]; alive: [R] bool-ish; plt_i/plt_s/ab from
    build_perlane_tables (device arrays); chunk_live: optional [NC] skip
    flags; excl: optional [1, R] excluded triangle id per ray; any_hit:
    occlusion mode — ROW_ID != 0 means "some triangle intersects" but t and
    the winner state are NOT the nearest hit (lanes stop at the first hit
    found, like a shadow-feeler that needs no ordering); sort_lanes: permute
    each chunk's lanes into page-count classes before grouping (bit-exact
    round trip; default: on when the chunk spans >= 2 groups).
    """
    if sort_lanes is None:
        sort_lanes = ray_chunk >= 2 * GROUP
    assert ray_chunk % GROUP == 0, \
        f"per-lane traversal needs ray_chunk % {GROUP} == 0, got {ray_chunk}"
    RB = ray_chunk
    R = OT.shape[1]
    NC = R // RB

    if chunk_live is None:
        chunk_live = jnp.ones((NC,), jnp.int32)
    NC8 = -(-NC // 8) * 8
    flags = jnp.zeros((NC8, 128), jnp.int32).at[:NC, 0].set(
        chunk_live.astype(jnp.int32))
    arow = alive.astype(F32)[None, :]

    exclude_id = excl is not None
    in_specs = [
        pl.BlockSpec((8, 128), lambda i: (i // 8, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((3, RB), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, RB), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, RB), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    args = [flags, OT.astype(F32), DT.astype(F32), arow]
    if exclude_id:
        in_specs.append(pl.BlockSpec((1, RB), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
        args.append(excl.astype(F32))
    else:
        # placeholder so the kernel signature stays fixed
        in_specs.append(pl.BlockSpec((1, RB), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
        args.append(arow)
    NB = plt_i.shape[0] // (N_INT * page_size)
    in_specs += [
        pl.BlockSpec((NB * GROUP, PACK_LANES), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((NB * N_INT * page_size, GROUP), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((NB * N_SHD * page_size, GROUP), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args += [ab, plt_i, plt_s]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(NC,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((TRACE_ROWS, RB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((TRACE_ROWS, RB), F32),
            pltpu.VMEM((8, RB), F32),
            pltpu.VMEM((RB, RB) if sort_lanes else (8, 128), BF16),
            pltpu.VMEM((RB, RB) if sort_lanes else (8, 128), F32),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_kernel, page_size=page_size, ray_chunk=RB,
                          exclude_id=exclude_id, any_hit=any_hit,
                          sort_lanes=sort_lanes, nb=NB,
                          permute_gather=permute_gather),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((TRACE_ROWS, R), F32)],
        interpret=interpret,
    )(*args)[0]
    return out


@functools.partial(jax.jit, static_argnames=("page_size", "ray_chunk",
                                             "fixed_rng", "weight_cutoff",
                                             "interpret", "sort_lanes",
                                             "permute_gather"))
def trace_shade_perlane_pallas(state, plt_i, plt_s, ab, seed,
                               page_size: int, ray_chunk: int,
                               fixed_rng: bool, weight_cutoff: float,
                               chunk_live=None, interpret: bool = False,
                               sort_lanes=None, light=None, grid_live=None,
                               permute_gather=None):
    """One bounce wave = trace + shade + state update, fused per chunk.

    state: [16, R] (ops.compact layout; o rows 0..2, d rows 3..5, alive row
    7); seed: [2] uint32 (key folded with the wave by the caller).  Returns
    the post-wave state [16, R].  Not used for lights configs (the shadow
    pass must run between trace and shade — engine keeps those unfused).

    grid_live: optional TRACED int32 — number of leading chunks the grid
    visits (a Mosaic DYNAMIC grid dimension).  After compaction the live
    rays form a dense prefix, so the chunks past `grid_live` hold only
    zero gap lanes whose pass-through is the identity; `state` is aliased
    into the output, so unvisited tail blocks keep their input bits —
    bit-identical to visiting them, without paying the dead grid steps'
    DMA + dispatch (~1 us/chunk x thousands of tail chunks per bounce
    wave on 2k renders).  None = static full grid (callers without a
    survivor prefix)."""
    if sort_lanes is None:
        sort_lanes = ray_chunk >= 2 * GROUP
    assert ray_chunk % GROUP == 0, \
        f"per-lane traversal needs ray_chunk % {GROUP} == 0, got {ray_chunk}"
    RB = ray_chunk
    R = state.shape[1]
    NC = R // RB

    if chunk_live is None:
        chunk_live = jnp.ones((NC,), jnp.int32)
    NC8 = -(-NC // 8) * 8
    flags = jnp.zeros((NC8, 128), jnp.int32).at[:NC, 0].set(
        chunk_live.astype(jnp.int32))
    seed2 = jnp.zeros((1, 2), jnp.int32).at[0].set(seed.astype(jnp.int32))
    has_lights = light is not None
    light8 = jnp.zeros((1, 8), F32)
    if has_lights:
        light8 = light8.at[0, 0:4].set(light.astype(F32))

    NB = plt_i.shape[0] // (N_INT * page_size)
    if grid_live is None:
        grid_n = NC
    else:
        # dynamic grid: visit only the survivor-prefix chunks (>= 1 so the
        # program is well-formed even with zero survivors)
        grid_n = jnp.clip(grid_live.astype(jnp.int32), 1, NC)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(grid_n,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((STATE_ROWS, RB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB * GROUP, PACK_LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB * N_INT * page_size, GROUP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB * N_SHD * page_size, GROUP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((STATE_ROWS, RB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((TRACE_ROWS, RB), F32),
            pltpu.VMEM((TRACE_ROWS, RB), F32),
            pltpu.VMEM((8, RB), F32),
            pltpu.VMEM((RB, RB) if sort_lanes else (8, 128), BF16),
            pltpu.VMEM((RB, RB) if sort_lanes else (8, 128), F32),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_kernel_fused, page_size=page_size, ray_chunk=RB,
                          fixed_rng=fixed_rng, weight_cutoff=weight_cutoff,
                          sort_lanes=sort_lanes, nb=NB,
                          has_lights=has_lights,
                          permute_gather=permute_gather),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((STATE_ROWS, R), F32)],
        # the state input aliases the output so tail blocks a dynamic grid
        # never visits keep their bits (the _skip pass-through's identity)
        input_output_aliases={3: 0},
        interpret=interpret,
    )(flags, seed2, light8, state.astype(F32), ab, plt_i, plt_s)[0]
    return out
