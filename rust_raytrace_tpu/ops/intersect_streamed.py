"""HBM-streamed banked per-lane traversal — the unbounded-scene regime.

The banked per-lane kernel (ops/intersect_perlane.py) keeps its gather
tables VMEM-resident, which caps the scene at MAX_BANKS*128 pages and
~262k triangle slots (engine table budget).  Beyond that, round 3 fell
back to the chunk-union kernel for bounce waves — correct but structurally
slow for scattered rays (the whole reason the per-lane path exists) and
unmeasured.  This module removes the cap the TPU way:

  - the per-bank gather tables live in HBM ([NB, 17P, 128] / [NB, 7P, 128],
    any NB) and are DMA'd into a VMEM scratch ONE BANK AT A TIME, exactly
    like the union kernel streams triangle pages (intersect_pallas
    _trace_pages);
  - each chunk walks its PERSONAL bank worklist FRONT-TO-BACK: a bank-level
    slab test ([NB, RB], the page slab test one level up) gives every
    lane's bank entry distances; a while-loop repeatedly picks the bank
    with the globally nearest remaining entry, DMAs its tables, and runs
    the standard in-bank per-lane traversal (page slabs from the
    VMEM-resident fine-page AABB table + gather/predicate/winner loop,
    the same math as intersect_perlane._group);
  - the cross-bank front-to-back cut is bit-exact: a bank's AABB contains
    its pages' AABBs, so bank_tlo <= page_tlo <= any hit t in the bank —
    once every lane's best_t beats a bank's entry, that bank can be
    dropped (the same argument as the per-page cut, one level up).
    Winner (t, id) therefore equals the resident banked kernel's and the
    union kernel's bitwise (lexicographic (t, id) ties are visit-order
    independent);
  - winner PAYLOAD extraction cannot wait for the end (the winning bank's
    table would be gone from VMEM), so each bank-visit re-extracts the
    payload rows for lanes whose running winner lives in THIS bank,
    overwriting earlier banks' rows.  A lane's final extraction happens at
    its final winner's visit — identical values to a single extraction at
    the end (same table, same predicate, same masked reduce).

The in-chunk count sort (intersect_perlane step 2) is kept, with the key
REPLACED by the lane's primary BANK from the bank-level slab (fine
per-bank page counts would need every bank's page slab up front — the
very thing streaming avoids).  Groups become bank-homogeneous, so most
bank-visits touch 1-2 of the chunk's 8 groups and the per-group
`jnp.any` gates skip the rest.

Structural reference: the reference's scale-free octree traversal
(raytrace.rs:790-845, depth <= 10 at any triangle count) — rebuilt as a
two-level (bank -> page) worklist over KD-ordered pages with the level-0
tables streamed from HBM.  The engine selects this path automatically
when the scene exceeds the resident-table budget (engine.Engine).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .compact import (STATE_ROWS, _gather_lanes, _onehot,
                      _src_index_from_onehot)
from .intersect_pallas import (ROW_ALPHA, ROW_COLOR, ROW_ENC, ROW_ID,
                               ROW_NORM, ROW_SCAT, ROW_T, TRACE_ROWS,
                               packed_hit_predicate)
from .intersect_perlane import (GROUP, N_INT, N_SHD, PAGES_PER_STEP, _slab,
                                build_perlane_tables)
from .pages import PACK_LANES, PageTables
from .shade import _shade_state_rows, scatter_rv

F32 = jnp.float32

#: bank-major winner-stream rows: 0..10 = TRACE payload layout (t, id,
#: extraction rows 2..10), 11 = best_pg, 12..15 pad.  Extraction rides the
#: sweep (extraction-overwrite, the worklist kernel's own trick), so the
#: finish phase never touches the bank tables.
WN_ROWS = 16
WN_PG = 11
#: banks swept per grid step.  MEASURED: 1 is right.  A quad (4) was
#: tried to amortize the per-visit row round trip — it LOST 3-4x
#: (probe_r16f: coherent 73.6 -> 272.6 ms, decoherent 193.4 -> 588.8),
#: because the sweep's cost unit is the GATED REGION, not the visit:
#: both one-bank kernels match a ~1 us/evaluated-region model almost
#: exactly (probe_r16e: worklist 24k visits x ~9 regions ~ 225 ms,
#: bank-major 24k x 8 ~ 193 ms), and a quad multiplies regions per
#: visit by 4 (+ nested extraction whens) while visits drop by less
#: (a decoherent chunk demanding 30/35 banks demands EVERY quad).
BANKS_PER_STEP = 1
BF16 = jnp.bfloat16


def build_streamed_tables(pages: PageTables):
    """Bank tables for the streamed kernel — build_perlane_tables' layout
    with NO bank cap, reshaped so one bank is one HBM slab:

      plt_i   [NB, N_INT*P, 128] f32   intersect features, pages on lanes
      plt_s   [NB, N_SHD*P, 128] f32   shade features
      ab      [NB*128, 128] f32        fine page AABBs (lanes 0..2 lo,
                                       3..5 hi, 6 valid)
      bank_ab [NB8, 128] f32           bank AABBs (union of the bank's
                                       pages; same lane layout), NB8 = NB
                                       padded to a multiple of 8 sublanes
    """
    import rust_raytrace_tpu.ops.intersect_perlane as perlane

    NP = pages.num_pages
    NB = -(-NP // GROUP)
    # reuse the resident builder with the cap lifted for this call
    old = perlane.MAX_BANKS
    try:
        perlane.MAX_BANKS = NB
        plt_i, plt_s, ab = build_perlane_tables(pages)
    finally:
        perlane.MAX_BANKS = old
    P = pages.page_size
    plt_i = plt_i.reshape(NB, N_INT * P, GROUP)
    plt_s = plt_s.reshape(NB, N_SHD * P, GROUP)

    NB8 = -(-NB // 8) * 8
    bank_ab = np.zeros((NB8, PACK_LANES), np.float32)
    for b in range(NB):
        lo = pages.aabb_lo[b * GROUP:(b + 1) * GROUP]
        hi = pages.aabb_hi[b * GROUP:(b + 1) * GROUP]
        ok = np.isfinite(lo).all(axis=1)
        if not ok.any():
            continue
        bank_ab[b, 0:3] = lo[ok].min(axis=0)
        bank_ab[b, 3:6] = hi[ok].max(axis=0)
        bank_ab[b, 6] = 1.0
    return plt_i, plt_s, ab, bank_ab


def _bank_group_pass(plt_b, plts_b, ab_b, b_f, o3, d3, a1, excl, sb, S, sl,
                     P: int, any_hit: bool, extract_payload: bool,
                     pg_row: int = 2):
    """In-bank per-lane traversal for one 128-ray group, bank tables in
    VMEM scratch (`plt_b`/`plts_b` values), fine-page AABBs in `ab_b`
    ([128, lanes] value sliced at the bank's dynamic offset), dynamic bank
    index `b_f` (f32 scalar).  Winner rides the sb ref rows 0..1 + pg_row
    (best_t/id at rows 0-1, best_pg at `pg_row` — the bank-major sweep
    passes its [16, RB] winner stream as BOTH sb and S, with pg parked at
    row 11 so extraction's payload rows 2..10 don't collide; the worklist
    kernel keeps a separate [8, RB] sb with the default pg_row=2); this
    pass reads/writes its `sl` columns.  Payload extraction OVERWRITES S
    rows for lanes whose running winner is in this bank.  Math identical
    to intersect_perlane._group (the bit-exactness contract's anchor)."""
    valid = a1[0:1, :] != 0.0

    page_f2 = jax.lax.broadcasted_iota(jnp.int32, (GROUP, GROUP),
                                       0).astype(F32)
    o0, o1, o2 = (o3[k:k + 1, :] for k in range(3))
    d0, d1, d2 = (d3[k:k + 1, :] for k in range(3))

    def feat(G, f):
        return G[f * P:(f + 1) * P, :]

    def predicate(G, has):
        # single-sourced hit arithmetic (intersect_pallas.packed_hit_
        # predicate — the bit-exactness anchor shared with the resident
        # per-lane and union kernels)
        return packed_hit_predicate(
            lambda f: feat(G, f), (o0, o1, o2), (d0, d1, d2), has=has,
            excl=excl[0:1, :] if excl is not None else None)

    best_t = sb[0:1, sl]
    best_id = sb[1:2, sl]
    best_pg = sb[pg_row:pg_row + 1, sl]

    tlo, thi, page_ok = _slab(ab_b, o3, d3)          # [128, 128]
    hit = (tlo <= thi) & (thi >= 0.0) & valid & page_ok
    # cross-bank front-to-back cut + any_hit early exit (always gated:
    # the bank worklist may hand us any bank after the first)
    hit = hit & (tlo <= best_t)
    if any_hit:
        hit = hit & (best_id == 0.0)
    hit_f0 = hit.astype(F32)

    def select_nearest(hit_f, tkey_mask_pages=()):
        tkey = jnp.where(hit_f > 0.0, tlo, jnp.inf)
        for mp in tkey_mask_pages:
            tkey = jnp.where(page_f2 == mp, jnp.inf, tkey)
        kmin = jnp.min(tkey, axis=0, keepdims=True)
        has = kmin < jnp.inf
        pidx = jnp.where(
            has,
            jnp.min(jnp.where(tkey == kmin, page_f2, F32(GROUP)),
                    axis=0, keepdims=True),
            F32(GROUP))
        return has, pidx, kmin

    def test_page(has, pidx, best_t, best_id, best_pg):
        page = jnp.where(has, pidx, 0.0)
        idx = jnp.broadcast_to(page.astype(jnp.int32), plt_b.shape)
        G = jnp.take_along_axis(plt_b, idx, axis=1)
        t, ok, ids, _, _ = predicate(G, has)
        tt = jnp.where(ok, t, jnp.inf)
        pmin = jnp.min(tt, axis=0, keepdims=True)
        pid = jnp.min(jnp.where(tt == pmin, ids, jnp.inf), axis=0,
                      keepdims=True)
        upd = (pmin < best_t) | ((pmin == best_t) & ~jnp.isinf(pmin)
                                 & (pid < best_id))
        best_t = jnp.where(upd, pmin, best_t)
        best_id = jnp.where(upd, pid, best_id)
        best_pg = jnp.where(upd, page + b_f * F32(GROUP), best_pg)
        return best_t, best_id, best_pg

    def body(carry):
        work, hit_f, best_t, best_id, best_pg = carry
        del work
        if any_hit:
            pidx = jnp.min(jnp.where(hit_f > 0.0, page_f2, F32(GROUP)),
                           axis=0, keepdims=True)
            has = pidx < F32(GROUP)
            best_t, best_id, best_pg = test_page(
                has, pidx, best_t, best_id, best_pg)
            keep = (page_f2 != pidx) & (tlo <= best_t) & (best_id == 0.0)
            hit_f = hit_f * keep.astype(F32)
            return (jnp.max(hit_f), hit_f, best_t, best_id, best_pg)
        hasA, pidxA, _ = select_nearest(hit_f)
        best_t, best_id, best_pg = test_page(
            hasA, pidxA, best_t, best_id, best_pg)
        extra = [pidxA]
        for _ in range(PAGES_PER_STEP - 1):
            hasB, pidxB, ktloB = select_nearest(hit_f, extra)
            hasB = hasB & (ktloB <= best_t)
            best_t, best_id, best_pg = test_page(
                hasB, pidxB, best_t, best_id, best_pg)
            extra.append(pidxB)
        keep = tlo <= best_t
        for p in extra:
            keep = keep & (page_f2 != p)
        hit_f = hit_f * keep.astype(F32)
        return jnp.max(hit_f), hit_f, best_t, best_id, best_pg

    def cond(carry):
        return carry[0] > 0.0

    _, _, best_t, best_id, best_pg = jax.lax.while_loop(
        cond, body, (jnp.max(hit_f0), hit_f0, best_t, best_id, best_pg))

    sb[0:1, sl] = best_t
    sb[1:2, sl] = best_id
    sb[pg_row:pg_row + 1, sl] = best_pg

    if not extract_payload:
        return

    # payload extraction-overwrite: lanes whose RUNNING winner is in
    # this bank (such a lane was necessarily updated during this visit; a
    # later bank that beats it overwrites again, so the final write is
    # from the final winner's table — bit-identical to a single extraction
    # at the end)
    _bank_extract(plt_b, plts_b, b_f, o3, d3, excl, best_t, best_id,
                  best_pg, S, sl, P)


def _bank_extract(plt_b, plts_b, b_f, o3, d3, excl, best_t, best_id,
                  best_pg, S, sl, P: int):
    """Winner-payload extraction for one 128-ray group from ONE bank's
    tables (in VMEM): lanes whose winner page lives in bank `b_f` re-run
    the predicate on their winner page and masked-reduce the feature rows
    into S.  Shared by the worklist kernel (per-visit overwrite) and the
    bank-major finish pass (single extraction from the final winner bank)
    — same table, same predicate, same reduce, so the two schedules are
    bit-identical."""
    del best_t
    o0, o1, o2 = (o3[k:k + 1, :] for k in range(3))
    d0, d1, d2 = (d3[k:k + 1, :] for k in range(3))

    def feat(G, f):
        return G[f * P:(f + 1) * P, :]

    in_b = (best_id != 0.0) & (best_pg >= b_f * F32(GROUP)) \
        & (best_pg < (b_f + 1.0) * F32(GROUP))

    @pl.when(jnp.any(in_b))
    def _extract():
        local = jnp.clip(best_pg - b_f * F32(GROUP), 0.0, F32(GROUP - 1))
        idxw = jnp.broadcast_to(local.astype(jnp.int32), plt_b.shape)
        Gw = jnp.take_along_axis(plt_b, idxw, axis=1)
        idxs = jnp.broadcast_to(local.astype(jnp.int32), plts_b.shape)
        Gs = jnp.take_along_axis(plts_b, idxs, axis=1)

        t, ok, ids, md_n, (dv0, dv1, dv2) = packed_hit_predicate(
            lambda f: feat(Gw, f), (o0, o1, o2), (d0, d1, d2), has=in_b,
            excl=excl[0:1, :] if excl is not None else None)
        del t, ok
        win = (ids == best_id) & in_b
        wf = win.astype(F32)

        def ext(v):
            return jnp.sum(wf * v, axis=0, keepdims=True)

        def featS(f):
            return Gs[f * P:(f + 1) * P, :]

        inv_et = 1.0 - featS(0)
        edge = (dv0 > inv_et) | (dv1 > inv_et) | (dv2 > inv_et)
        back = md_n > 0.0
        enc = featS(1) + 4.0 * edge.astype(F32) + 8.0 * back.astype(F32)
        for r, v in ((ROW_NORM, ext(feat(Gw, 0))),
                     (ROW_NORM + 1, ext(feat(Gw, 1))),
                     (ROW_NORM + 2, ext(feat(Gw, 2))),
                     (ROW_ENC, ext(enc)),
                     (ROW_COLOR, ext(featS(2))),
                     (ROW_COLOR + 1, ext(featS(3))),
                     (ROW_COLOR + 2, ext(featS(4))),
                     (ROW_ALPHA, ext(featS(5))),
                     (ROW_SCAT, ext(featS(6)))):
            S[r:r + 1, sl] = jnp.where(in_b, v, S[r:r + 1, sl])


def _primary_bank_sort(bank_ab_ref, bank_iota, o3, d3, a1, excl, klt, subf,
                       RB: int, NB8: int):
    """In-chunk sort by PRIMARY BANK (bank-level slab key): groups become
    bank-homogeneous so each bank-visit touches 1-2 groups.  Dead/sky
    lanes sort last.  (Fine per-bank page counts — the resident kernel's
    key — would need every bank's page slab up front, defeating the
    streaming.)  Returns the permuted (o3, d3, a1, excl) and `dest`
    [1, RB] — each ORIGINAL lane's destination position, which inverts
    the permutation via `_gather_lanes(sorted_vals, dest, RB)`."""
    valid = a1[0:1, :] != 0.0
    btlo, bthi, bok = _slab(bank_ab_ref[:], o3, d3)          # [NB8, RB]
    bhit = (btlo <= bthi) & (bthi >= 0.0) & valid & bok
    pb = jnp.min(jnp.where(bhit, bank_iota, F32(NB8)),
                 axis=0, keepdims=True)                      # [1, RB]
    qsum = jnp.where(valid, pb, F32(NB8 + 1))
    nbk = NB8 + 2
    masks = jnp.concatenate(
        [jnp.where(qsum == F32(q), F32(1.0), F32(0.0))
         for q in range(nbk)], axis=0)                       # [nbk, RB]
    ranks = jax.lax.dot_general(
        masks.astype(BF16), klt, (((1,), (1,)), ((), ())),
        preferred_element_type=F32)
    tot = jnp.sum(masks, axis=1, keepdims=True)
    dest = jnp.zeros_like(qsum)
    base = F32(0.0)
    for q in range(nbk):
        dest = dest + masks[q:q + 1] * (base + ranks[q:q + 1])
        base = base + tot[q, 0]
    M = _onehot(dest, jnp.ones_like(dest), RB, subf)
    srcidx = _src_index_from_onehot(M, RB)
    in8 = jnp.concatenate(
        [o3, d3, a1[0:1, :],
         excl[0:1, :] if excl is not None else a1[0:1, :]], axis=0)
    p8 = _gather_lanes(in8, srcidx, RB)
    return (p8[0:3], p8[3:6], p8[6:7],
            p8[7:8] if excl is not None else None, dest)


def _streamed_trace_chunk(o3, d3, a1, excl, bank_ab_ref, ab_ref, plt_i_hbm,
                          plt_s_hbm, S, sb, tkey_s, bi_buf, bs_buf, sem_i,
                          sem_s, klt, subf, *, P: int, RB: int, NB: int,
                          NB8: int, any_hit: bool, sort_lanes: bool,
                          extract_payload: bool, stats: bool = False):
    """Bank-worklist traversal of one chunk.  Winner rows land in S
    [16, RB] in SORTED lane order; returns the destination map `dest`
    [1, RB] when sort_lanes (caller inverts with a lane gather), else
    None."""
    valid = a1[0:1, :] != 0.0
    bank_iota = jax.lax.broadcasted_iota(jnp.int32, (NB8, RB),
                                         0).astype(F32)

    dest = None
    if sort_lanes:
        o3, d3, a1, excl, dest = _primary_bank_sort(
            bank_ab_ref, bank_iota, o3, d3, a1, excl, klt, subf, RB, NB8)
        valid = a1[0:1, :] != 0.0

    # bank slab on the (possibly permuted) lanes -> the bank worklist
    btlo, bthi, bok = _slab(bank_ab_ref[:], o3, d3)
    bhit = (btlo <= bthi) & (bthi >= 0.0) & valid & bok
    tkey_s[:] = jnp.where(bhit, btlo, jnp.inf)

    S[0:1, :] = jnp.where(valid, jnp.inf, -jnp.inf)
    S[1:TRACE_ROWS, :] = jnp.zeros_like(S[1:TRACE_ROWS, :])
    sb[0:1, :] = jnp.where(valid, jnp.inf, -jnp.inf)
    sb[1:2, :] = jnp.zeros_like(sb[1:2, :])
    sb[2:3, :] = jnp.zeros_like(sb[2:3, :])

    def dma_pair(bank, slot):
        return (pltpu.make_async_copy(plt_i_hbm.at[bank], bi_buf.at[slot],
                                      sem_i.at[slot]),
                pltpu.make_async_copy(plt_s_hbm.at[bank], bs_buf.at[slot],
                                      sem_s.at[slot]))

    def start(bank, slot):
        for cp in dma_pair(bank, slot):
            cp.start()

    def wait(bank, slot):
        for cp in dma_pair(bank, slot):
            cp.wait()

    def nearest(tk, m):
        """Bank id (f32) whose entry equals the global min m."""
        bmin = jnp.min(tk, axis=1, keepdims=True)            # [NB8, 1]
        return jnp.min(jnp.where(bmin == m, bank_iota[:, 0:1], F32(NB8)))

    # --- double-buffered bank DMA with a front-to-back GUESS prefetch ---
    # The next bank to visit is only known after this visit's cross-bank
    # cut, but it is ALMOST ALWAYS the second-nearest remaining entry (the
    # cut either removes banks beyond the cut wholesale — ending the loop
    # — or leaves the near ones); so each visit starts the second-nearest
    # bank's DMA into the other buffer slot while it traverses, and the
    # next iteration verifies: guess right -> the tables are already in
    # flight/landed; wrong -> drain the stale copy and fetch the true
    # bank (exactly the pre-prefetch cost).  Bit-exact by construction —
    # the visit order and all arithmetic are unchanged; only the DMA
    # timing moves (the union kernel's own pipelining pattern,
    # _trace_pages; VERDICT r4 weak #3).
    m0 = jnp.min(tkey_s[:])
    b0 = nearest(tkey_s[:], m0)

    @pl.when(m0 < jnp.inf)
    def _first():
        start(b0.astype(jnp.int32), jnp.int32(0))

    def cond(carry):
        return carry[1] < jnp.inf

    def body(carry):
        it, m, cur, pend = carry
        # globally nearest remaining bank (front-to-back across banks —
        # raytrace.rs:941-947 one level up)
        tk = tkey_s[:]
        b_f = nearest(tk, m)
        b = b_f.astype(jnp.int32)

        @pl.when((b != pend) & (pend >= 0))
        def _miss_drain():
            # wrong guess in flight into our slot: drain it before the
            # refetch (waiting on a DMA that was never started faults the
            # chip — pend is -1 exactly when no guess was launched, which
            # provably only happens on the loop's last pass, but the
            # guard keeps the invariant local)
            wait(pend, cur)

        @pl.when(b != pend)
        def _miss_fetch():
            # fetch the true bank (the serial pre-prefetch path)
            start(b, cur)

        # per-lane demand for THIS bank (computed while the DMA flies)
        lanes_b = jnp.sum(
            jnp.where((bank_iota == b_f) & (tk < jnp.inf), F32(1.0),
                      F32(0.0)), axis=0, keepdims=True)      # [1, RB]
        ab_b = ab_ref[pl.ds(b * GROUP, GROUP), :]
        wait(b, cur)

        # guess prefetch: second-nearest remaining entry (pre-cut) into
        # the other slot
        tk2 = jnp.where(bank_iota == b_f, jnp.inf, tk)
        m2 = jnp.min(tk2)
        g_f = nearest(tk2, m2)
        other = jnp.int32(1) - cur
        guess = jnp.where(m2 < jnp.inf, g_f.astype(jnp.int32),
                          jnp.int32(-1))

        @pl.when(m2 < jnp.inf)
        def _prefetch():
            start(g_f.astype(jnp.int32), other)

        plt_b = bi_buf[cur]
        plts_b = bs_buf[cur]
        for g in range(RB // GROUP):
            sl = slice(g * GROUP, (g + 1) * GROUP)

            @pl.when(jnp.any(lanes_b[0:1, sl] > 0.0))
            def _g(sl=sl):
                _bank_group_pass(plt_b, plts_b, ab_b, b_f, o3[:, sl],
                                 d3[:, sl], a1[:, sl],
                                 excl[:, sl] if excl is not None else None,
                                 sb, S, sl, P, any_hit, extract_payload)
        if stats:
            # row 12: live group-pass count (the unit of per-visit compute
            # — each pass is one [128,128] slab + gather while-loop)
            npv = F32(0.0)
            for g in range(RB // GROUP):
                sl = slice(g * GROUP, (g + 1) * GROUP)
                npv = npv + jnp.where(jnp.any(lanes_b[0:1, sl] > 0.0),
                                      F32(1.0), F32(0.0))
            S[12:13, :] = S[12:13, :] + jnp.broadcast_to(
                npv, (1, S.shape[1]))
        # retire this bank; drop banks no lane can improve in (bank entry
        # beyond the lane's best: bit-exact, see module docstring); any_hit
        # lanes with a hit stop demanding banks entirely
        best_t = sb[0:1, :]
        tk = jnp.where(bank_iota == b_f, jnp.inf, tkey_s[:])
        tk = jnp.where(tk <= best_t, tk, jnp.inf)
        if any_hit:
            tk = jnp.where(sb[1:2, :] == 0.0, tk, jnp.inf)
        tkey_s[:] = tk
        return it + 1, jnp.min(tk), other, guess

    # pend carries the bank id whose DMA is in flight into slot `cur`;
    # -1 = none.  An all-sky chunk (m0 == inf — the MAJORITY of wave-0
    # chunks, 2211/3600 on synthetic_1m) never starts a DMA, so its pend
    # MUST be -1 or the exit drain below waits on a never-started copy
    # and faults the TPU worker (interpret mode does not simulate the
    # block, so only the chip catches this).
    pend0 = jnp.where(m0 < jnp.inf, b0.astype(jnp.int32), jnp.int32(-1))
    it_f, _, cur_f, pend_f = jax.lax.while_loop(
        cond, body, (jnp.int32(0), m0, jnp.int32(0), pend0))

    # a guess prefetch may still be in flight when the loop exits (the cut
    # retired everything it targeted) — drain it before the buffers are
    # reused by the next chunk's grid step
    @pl.when(pend_f >= 0)
    def _drain():
        wait(pend_f, cur_f)

    S[ROW_T:ROW_T + 1, :] = sb[0:1, :]
    S[ROW_ID:ROW_ID + 1, :] = sb[1:2, :]
    if stats:
        # profiling channel (row 11 is unused by the trace contract): this
        # chunk's bank-visit count — each visit is one (plt_i + plt_s) bank
        # DMA, so visits x bank bytes = the kernel's HBM table traffic
        S[11:12, :] = jnp.broadcast_to(it_f.astype(F32), (1, S.shape[1]))
    return dest


def _kernel_streamed(flags_ref, o_ref, d_ref, a_ref, excl_ref, bank_ab_ref,
                     ab_ref, plt_i_hbm, plt_s_hbm, out_ref, S, sb, tkey_s,
                     bi_buf, bs_buf, sem_i, sem_s, klt_s, subf_s, *,
                     page_size: int, ray_chunk: int, nb: int, nb8: int,
                     exclude_id: bool, any_hit: bool, sort_lanes: bool,
                     stats: bool = False):
    row = jax.lax.rem(pl.program_id(0), 8)
    out_ref[:] = jnp.zeros_like(out_ref)
    _sort_scratch_build(klt_s, subf_s, ray_chunk, sort_lanes)

    @pl.when(flags_ref[row, 0] != 0)
    def _busy():
        dest = _streamed_trace_chunk(
            o_ref[:], d_ref[:], a_ref[:],
            excl_ref[:] if exclude_id else None, bank_ab_ref, ab_ref,
            plt_i_hbm, plt_s_hbm, S, sb, tkey_s, bi_buf, bs_buf, sem_i,
            sem_s, klt_s[:] if sort_lanes else None,
            subf_s[:] if sort_lanes else None, P=page_size, RB=ray_chunk,
            NB=nb, NB8=nb8, any_hit=any_hit, sort_lanes=sort_lanes,
            extract_payload=not any_hit, stats=stats)
        if sort_lanes:
            out_ref[:] = _gather_lanes(S[:], dest, ray_chunk)
        else:
            out_ref[:] = S[:]


def _kernel_streamed_fused(flags_ref, seed_ref, st_ref, bank_ab_ref, ab_ref,
                           plt_i_hbm, plt_s_hbm, out_ref, S, sb, tkey_s,
                           bi_buf, bs_buf, sem_i, sem_s, klt_s, subf_s, *,
                           page_size: int, ray_chunk: int, nb: int,
                           nb8: int, fixed_rng: bool, weight_cutoff: float,
                           sort_lanes: bool):
    """Fused trace + shade for bounce (and primary) waves in the streamed
    regime: winner rows never leave VMEM (same fusion rationale as
    intersect_perlane._kernel_fused).  Lights configs stay UNFUSED in this
    regime (the shadow pass runs as a separate any_hit streamed trace
    between trace and shade — a second in-kernel bank sweep would double
    the worklist machinery for one scene class)."""
    pid = pl.program_id(0)
    row = jax.lax.rem(pid, 8)
    live = flags_ref[row, 0] != 0
    _sort_scratch_build(klt_s, subf_s, ray_chunk, sort_lanes)

    @pl.when(jnp.logical_not(live))
    def _skip():
        out_ref[:] = st_ref[:]

    @pl.when(live)
    def _busy():
        st = st_ref[:]
        dest = _streamed_trace_chunk(
            st[0:3], st[3:6], st[7:8], None, bank_ab_ref, ab_ref,
            plt_i_hbm, plt_s_hbm, S, sb, tkey_s, bi_buf, bs_buf, sem_i,
            sem_s, klt_s[:] if sort_lanes else None,
            subf_s[:] if sort_lanes else None, P=page_size, RB=ray_chunk,
            NB=nb, NB8=nb8, any_hit=False, sort_lanes=sort_lanes,
            extract_payload=True)
        rows = _gather_lanes(S[:], dest, ray_chunk) if sort_lanes else S[:]
        rv0, rv1, rv2 = scatter_rv(seed_ref[0, 0], seed_ref[0, 1], pid,
                                   ray_chunk, fixed_rng)
        out_ref[:] = _shade_state_rows(st, rows, rv0, rv1, rv2, None,
                                       weight_cutoff)


def _sort_scratch_build(klt_s, subf_s, RB: int, sort_lanes: bool):
    if not sort_lanes:
        return

    @pl.when(pl.program_id(0) == 0)
    def _():
        subq = jax.lax.broadcasted_iota(jnp.int32, (RB, RB), 0)
        laneq = jax.lax.broadcasted_iota(jnp.int32, (RB, RB), 1)
        klt_s[:] = (laneq < subq).astype(BF16)
        subf_s[:] = subq.astype(F32)


def _common_scratch(P: int, RB: int, NB8: int, sort_lanes: bool):
    return [
        pltpu.VMEM((TRACE_ROWS, RB), F32),            # S winner rows
        pltpu.VMEM((8, RB), F32),                     # sb best t/id/pg
        pltpu.VMEM((NB8, RB), F32),                   # tkey bank worklist
        pltpu.VMEM((2, N_INT * P, GROUP), F32),       # bank intersect bufs
        pltpu.VMEM((2, N_SHD * P, GROUP), F32),       # bank shade bufs
        pltpu.SemaphoreType.DMA((2,)),                # (double-buffered
        pltpu.SemaphoreType.DMA((2,)),                #  guess prefetch)
        pltpu.VMEM((RB, RB) if sort_lanes else (8, 128), BF16),
        pltpu.VMEM((RB, RB) if sort_lanes else (8, 128), F32),
    ]


@functools.partial(jax.jit, static_argnames=("page_size", "ray_chunk",
                                             "interpret", "any_hit",
                                             "sort_lanes", "stats"))
def trace_streamed_pallas(OT, DT, alive, plt_i, plt_s, ab, bank_ab,
                          page_size: int, ray_chunk: int, chunk_live=None,
                          interpret: bool = False, excl=None,
                          any_hit: bool = False, sort_lanes=None,
                          stats: bool = False):
    """Streamed-bank per-lane nearest hit (or any_hit occlusion) + winner
    state.  Same output contract as trace_perlane_pallas / the union
    kernel: OUT [16, R] (rows ROW_*); with any_hit the payload rows are
    NOT extracted (ROW_T/ROW_ID only — occlusion callers read just
    ROW_ID).  stats=True additionally writes each chunk's bank-visit
    count into row 11 (profiling only — row 11 is zero in the contract).

    plt_i/plt_s: [NB, 17P/7P, 128] HBM bank tables; ab [NB*128, 128] fine
    page AABBs (VMEM resident); bank_ab [NB8, 128] bank AABBs (from
    build_streamed_tables, device arrays).
    """
    if sort_lanes is None:
        sort_lanes = ray_chunk >= 2 * GROUP
    assert ray_chunk % GROUP == 0
    RB = ray_chunk
    R = OT.shape[1]
    NC = R // RB
    NB = plt_i.shape[0]
    NB8 = bank_ab.shape[0]

    if chunk_live is None:
        chunk_live = jnp.ones((NC,), jnp.int32)
    NC8 = -(-NC // 8) * 8
    flags = jnp.zeros((NC8, 128), jnp.int32).at[:NC, 0].set(
        chunk_live.astype(jnp.int32))
    arow = alive.astype(F32)[None, :]
    exclude_id = excl is not None

    P = page_size
    in_specs = [
        pl.BlockSpec((8, 128), lambda i: (i // 8, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((3, RB), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, RB), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, RB), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, RB), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((NB8, PACK_LANES), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((NB * GROUP, PACK_LANES), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    args = [flags, OT.astype(F32), DT.astype(F32), arow,
            excl.astype(F32) if exclude_id else arow,
            bank_ab, ab, plt_i, plt_s]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(NC,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((TRACE_ROWS, RB), lambda i: (0, i),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=_common_scratch(P, RB, NB8, sort_lanes),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_streamed, page_size=P, ray_chunk=RB,
                          nb=NB, nb8=NB8, exclude_id=exclude_id,
                          any_hit=any_hit, sort_lanes=sort_lanes,
                          stats=stats),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((TRACE_ROWS, R), F32)],
        interpret=interpret,
    )(*args)[0]
    return out


@functools.partial(jax.jit, static_argnames=("page_size", "ray_chunk",
                                             "fixed_rng", "weight_cutoff",
                                             "interpret", "sort_lanes"))
def trace_shade_streamed_pallas(state, plt_i, plt_s, ab, bank_ab, seed,
                                page_size: int, ray_chunk: int,
                                fixed_rng: bool, weight_cutoff: float,
                                chunk_live=None, interpret: bool = False,
                                sort_lanes=None, grid_live=None):
    """One wave = streamed-bank trace + shade + state update, fused per
    chunk (the streamed-regime analog of trace_shade_perlane_pallas; same
    state contract, dynamic survivor-prefix grid, input/output aliasing
    for unvisited tail blocks)."""
    if sort_lanes is None:
        sort_lanes = ray_chunk >= 2 * GROUP
    assert ray_chunk % GROUP == 0
    RB = ray_chunk
    R = state.shape[1]
    NC = R // RB
    NB = plt_i.shape[0]
    NB8 = bank_ab.shape[0]

    if chunk_live is None:
        chunk_live = jnp.ones((NC,), jnp.int32)
    NC8 = -(-NC // 8) * 8
    flags = jnp.zeros((NC8, 128), jnp.int32).at[:NC, 0].set(
        chunk_live.astype(jnp.int32))
    seed2 = jnp.zeros((1, 2), jnp.int32).at[0].set(seed.astype(jnp.int32))

    P = page_size
    if grid_live is None:
        grid_n = NC
    else:
        grid_n = jnp.clip(grid_live.astype(jnp.int32), 1, NC)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(grid_n,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((STATE_ROWS, RB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB8, PACK_LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB * GROUP, PACK_LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec((STATE_ROWS, RB), lambda i: (0, i),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=_common_scratch(P, RB, NB8, sort_lanes),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_streamed_fused, page_size=P, ray_chunk=RB,
                          nb=NB, nb8=NB8, fixed_rng=fixed_rng,
                          weight_cutoff=weight_cutoff,
                          sort_lanes=sort_lanes),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((STATE_ROWS, R), F32)],
        input_output_aliases={2: 0},
        interpret=interpret,
    )(flags, seed2, state.astype(F32), bank_ab, ab, plt_i, plt_s)[0]
    return out


# ===================== bank-major bounce sweep (round 5) ====================
#
# The worklist kernel above is chunk-major: every bank a chunk demands is a
# fresh (plt_i + plt_s) HBM DMA (~0.7 MB at P=56).  Coherent wave-0 rays
# demand ~1.7 banks/chunk and that is fine; SCATTERED bounce rays demand
# half the scene's banks per 1024-ray chunk, so one synthetic_1m render
# re-reads ~85 GB of tables — 4.3x the per-ray cost of the resident regime
# (BENCH_r04; probe_r15b budget: 881 of 974 ms in bounce waves).  The
# bank-major sweep inverts the loop the TPU way:
#
#   A. PREP (chunk-major grid): sort each live chunk's lanes by primary
#      bank (the existing in-chunk sort), emit the permuted rays + the
#      inverse map, the winner-row init, and a per-(bank, chunk) GROUP
#      DEMAND bitmask from the bank-level slab test.
#   B. glue (XLA, chunk x bank scale — no ray-scale ops): per bank, the
#      demanded chunk list (argsort of the demand matrix) + counts.
#   C. SWEEP (bank-major grid, one step per bank): the bank's tables ride
#      ordinary blocked BlockSpecs — Pallas DMAs each table ONCE PER BANK
#      PER WAVE (140 x 0.7 MB, not 124k x 0.7 MB) — while the per-chunk
#      ray/winner rows stream through a manually double-buffered
#      (96 KB/visit) pipeline: wait-write -> start-next-read -> compute ->
#      start-write, the compact.py segment-DMA pattern.  Each visit runs
#      the SAME _bank_group_pass as the worklist kernel.
#   D. FINISH (chunk-major grid): extract winner payloads from each
#      chunk's DISTINCT WINNER BANKS only (a handful; for low-hit bounce
#      waves near zero), un-permute via the phase-A map, and apply the
#      fused shade/scatter/state update (same rv stream: program ids are
#      the same chunk indices).
#
# Bit-exactness: winner selection is a lexicographic (t, id) min with
# exact pruning only (a page or bank whose entry tlo exceeds best_t cannot
# contain a better hit; ties keep the smaller id), so the min is
# VISIT-ORDER INDEPENDENT — the resident banked kernel already visits
# banks in index order while the worklist kernel goes front-to-back, and
# the suite pins them equal.  Payload extraction from the final winner's
# bank is the same predicate + masked reduce the per-visit overwrite ends
# with (see _bank_extract).  tests/test_streamed.py pins bank-major ==
# worklist bitwise on every surface.
#
# Structural reference: raytrace.rs:790-845's octree is scale-free per
# ray; this sweep restores the property per CHIP — table traffic is
# O(banks) per wave, not O(chunk-visits).


def _kernel_bm_prep(flags_ref, st_ref, bank_ab_ref, prm_ref, win_ref,
                    gm_ref, klt_s, subf_s, *, ray_chunk: int, nb8: int,
                    sort_lanes: bool):
    """Phase A: per live chunk, primary-bank lane sort + winner init +
    per-bank group-demand bitmask (gm column pid%128 of the current
    [NB8, 128] block; bit g = some lane of sorted group g slab-hits the
    bank)."""
    RB = ray_chunk
    pid = pl.program_id(0)
    row = jax.lax.rem(pid, 8)
    col = jax.lax.rem(pid, 128)
    _sort_scratch_build(klt_s, subf_s, RB, sort_lanes)
    bank_iota = jax.lax.broadcasted_iota(jnp.int32, (nb8, RB),
                                         0).astype(F32)

    @pl.when(col == 0)
    def _zero():
        gm_ref[:] = jnp.zeros_like(gm_ref)

    @pl.when(flags_ref[row, 0] != 0)
    def _busy():
        st = st_ref[:]
        o3, d3, a1 = st[0:3], st[3:6], st[7:8]
        if sort_lanes:
            o3, d3, a1, _, dest = _primary_bank_sort(
                bank_ab_ref, bank_iota, o3, d3, a1, None, klt_s[:],
                subf_s[:], RB, nb8)
        else:
            dest = jax.lax.broadcasted_iota(jnp.int32, (1, RB),
                                            1).astype(F32)
        valid = a1[0:1, :] != 0.0
        btlo, bthi, bok = _slab(bank_ab_ref[:], o3, d3)      # [NB8, RB]
        bhit = (btlo <= bthi) & (bthi >= 0.0) & valid & bok
        gmv = jnp.zeros((nb8, 1), jnp.int32)
        for g in range(RB // GROUP):
            anyg = jnp.any(bhit[:, g * GROUP:(g + 1) * GROUP], axis=1,
                           keepdims=True)
            gmv = gmv + jnp.where(anyg, jnp.int32(1 << g), jnp.int32(0))
        lane_i = jax.lax.broadcasted_iota(jnp.int32, gm_ref.shape, 1)
        gm_ref[:] = jnp.where(lane_i == col,
                              jnp.broadcast_to(gmv, gm_ref.shape),
                              gm_ref[:])
        prm_ref[0:3, :] = o3
        prm_ref[3:6, :] = d3
        prm_ref[6:7, :] = a1
        prm_ref[7:8, :] = dest
        # [16, RB] winner stream: rows 0..10 = the TRACE_ROWS payload
        # layout (t at 0, id at 1, extraction rows 2..10), best_pg parked
        # at row 11, rows 12..15 pad
        win_ref[0:1, :] = jnp.where(valid, jnp.inf, -jnp.inf)
        win_ref[1:WN_ROWS, :] = jnp.zeros_like(win_ref[1:WN_ROWS, :])


def _kernel_bm_sweep(cc_ref, cl_ref, gml_ref, ab_ref, plt_ref, plts_ref,
                     prm_hbm, win_in, win_out, pr0, pr1, wn0, wn1,
                     spi, swi, swo, *, page_size: int, ray_chunk: int,
                     nb8: int, bps: int):
    """Phase C: one grid step per QUAD of banks (BANKS_PER_STEP); the
    quad's tables arrive as ordinary blocked inputs (one DMA per bank per
    wave), and ray/winner rows stream through a manually double-buffered
    pipeline over the quad's demanded chunks — ONE [8+16, RB] row round
    trip serves all `bps` banks' gated group passes (probe_r16e: the
    per-visit overhead, not the row bytes, bounded the old one-bank
    sweep).  Winner-payload extraction rides each pass
    (extraction-overwrite on the [16, RB] stream), so the finish phase
    never touches the bank tables (the old per-(chunk, winner-bank)
    finish DMA was ~2.75 MB a pop, serial)."""
    P = page_size
    RB = ray_chunk
    q = pl.program_id(0)
    qrow = jax.lax.rem(q, 8)
    # gml block row base: each 8-row SMEM block holds 8 // bps steps'
    # per-bank gate rows
    grow = jax.lax.rem(q, 8 // bps) * bps
    nv = cc_ref[qrow, 0]

    del win_in  # aliased to win_out; ALL reads go through the output ref
    # (reading the aliased input ref would see a stale pre-sweep copy in
    # interpret mode, losing the cross-bank accumulation)

    def rd_pair(c, pr_s, wn_s, si):
        return (pltpu.make_async_copy(prm_hbm.at[:, pl.ds(c * RB, RB)],
                                      pr_s, spi.at[si]),
                pltpu.make_async_copy(win_out.at[:, pl.ds(c * RB, RB)],
                                      wn_s, swi.at[si]))

    def wr_copy(c, wn_s, si):
        return pltpu.make_async_copy(wn_s, win_out.at[:, pl.ds(c * RB, RB)],
                                     swo.at[si])

    def start_read(c, pr_s, wn_s, si):
        for cp in rd_pair(c, pr_s, wn_s, si):
            cp.start()

    def visit(c, i, pr_s, wn_s, si):
        for cp in rd_pair(c, pr_s, wn_s, si):
            cp.wait()
        o3 = pr_s[0:3, :]
        d3 = pr_s[3:6, :]
        a1 = pr_s[6:7, :]
        for bl in range(bps):
            gm = gml_ref[grow + bl, i]
            b_f = (q * bps + bl).astype(F32)
            plt_b = plt_ref[bl]
            plts_b = plts_ref[bl]
            ab_b = ab_ref[bl * GROUP:(bl + 1) * GROUP, :]
            for g in range(RB // GROUP):
                sl = slice(g * GROUP, (g + 1) * GROUP)

                @pl.when((gm // (1 << g)) % 2 == 1)
                def _g(sl=sl, b_f=b_f, plt_b=plt_b, plts_b=plts_b,
                       ab_b=ab_b):
                    _bank_group_pass(plt_b, plts_b, ab_b, b_f, o3[:, sl],
                                     d3[:, sl], a1[:, sl], None, wn_s,
                                     wn_s, sl, P, False,
                                     extract_payload=True, pg_row=WN_PG)
        wr_copy(c, wn_s, si).start()

    @pl.when(nv > 0)
    def _run():
        start_read(cl_ref[qrow, 0], pr0, wn0, 0)

        def body(i, pend):
            pend0, pend1 = pend
            c = cl_ref[qrow, i]
            s_is0 = jax.lax.rem(i, 2) == 0
            nxt = i + 1
            has_next = nxt < nv
            c_next = cl_ref[qrow, jnp.minimum(nxt, nv - 1)]

            # prepare the OTHER slot for visit i+1: drain its previous
            # write-out (the buffer is about to be overwritten), then
            # start the next chunk's reads into it
            @pl.when(has_next & s_is0)
            def _prep1():
                @pl.when(pend1 >= 0)
                def _():
                    wr_copy(pend1, wn1, 1).wait()
                start_read(c_next, pr1, wn1, 1)

            @pl.when(has_next & jnp.logical_not(s_is0))
            def _prep0():
                @pl.when(pend0 >= 0)
                def _():
                    wr_copy(pend0, wn0, 0).wait()
                start_read(c_next, pr0, wn0, 0)

            @pl.when(s_is0)
            def _v0():
                visit(c, i, pr0, wn0, 0)

            @pl.when(jnp.logical_not(s_is0))
            def _v1():
                visit(c, i, pr1, wn1, 1)

            pend0 = jnp.where(s_is0, c,
                              jnp.where(has_next, jnp.int32(-1), pend0))
            pend1 = jnp.where(s_is0,
                              jnp.where(has_next, jnp.int32(-1), pend1), c)
            return pend0, pend1

        pend0_f, pend1_f = jax.lax.fori_loop(
            0, nv, body, (jnp.int32(-1), jnp.int32(-1)))

        # drain this bank's outstanding write-outs before the next grid
        # step reads any winner block
        @pl.when(pend0_f >= 0)
        def _d0():
            wr_copy(pend0_f, wn0, 0).wait()

        @pl.when(pend1_f >= 0)
        def _d1():
            wr_copy(pend1_f, wn1, 1).wait()


def _kernel_bm_finish(flags_ref, seed_ref, st_ref, prm_ref, win_ref,
                      out_ref, *, ray_chunk: int, fixed_rng: bool,
                      weight_cutoff: float, sort_lanes: bool):
    """Phase D: un-permute the winner stream + fused shade/scatter/state
    update.  Payload extraction already happened IN the sweep
    (extraction-overwrite on the winner stream), so this phase touches no
    bank tables — the old per-(chunk, distinct-winner-bank) serial table
    DMA (~2.75 MB a pop at P=224, ~tens of GB on waves whose re-hit rate
    is high) is gone entirely."""
    RB = ray_chunk
    pid = pl.program_id(0)
    row = jax.lax.rem(pid, 8)
    live = flags_ref[row, 0] != 0

    @pl.when(jnp.logical_not(live))
    def _skip():
        out_ref[:] = st_ref[:]

    @pl.when(live)
    def _busy():
        st = st_ref[:]
        w = win_ref[:]
        # rows 0..10 carry the TRACE payload layout; the worklist kernel's
        # contract zeroes rows 11..15 (best_pg parks at WN_PG) — rebuild
        # that exact shape so the shade inputs are bitwise identical
        vals = jnp.concatenate(
            [w[0:WN_PG], jnp.zeros((TRACE_ROWS - WN_PG, RB), F32)], axis=0)
        rows = (_gather_lanes(vals, prm_ref[7:8, :], RB)
                if sort_lanes else vals)
        rv0, rv1, rv2 = scatter_rv(seed_ref[0, 0], seed_ref[0, 1], pid,
                                   RB, fixed_rng)
        out_ref[:] = _shade_state_rows(st, rows, rv0, rv1, rv2, None,
                                       weight_cutoff)


@functools.partial(jax.jit, static_argnames=("page_size", "ray_chunk",
                                             "fixed_rng", "weight_cutoff",
                                             "interpret", "sort_lanes"))
def trace_shade_bankmajor_pallas(state, plt_i, plt_s, ab, bank_ab, seed,
                                 page_size: int, ray_chunk: int,
                                 fixed_rng: bool, weight_cutoff: float,
                                 chunk_live=None, interpret: bool = False,
                                 sort_lanes=None, grid_live=None):
    """One bounce wave = bank-major streamed trace + shade + state update.

    Same contract as trace_shade_streamed_pallas (bit-exact equal to it —
    tests/test_streamed.py), but bank tables are DMA'd once per BANK per
    wave instead of once per chunk-visit: the scattered-bounce regime's
    table traffic drops from O(visits) x MB to O(banks) x MB, with the
    per-visit stream reduced to [8 + 16, RB] of ray/winner rows (~96 KB)
    shared by a QUAD of banks per visit (BANKS_PER_STEP), and winner
    payload extracted in-sweep so the finish phase is table-free."""
    if sort_lanes is None:
        sort_lanes = ray_chunk >= 2 * GROUP
    assert ray_chunk % GROUP == 0
    RB = ray_chunk
    R = state.shape[1]
    NC = R // RB
    NB = plt_i.shape[0]
    NB8 = bank_ab.shape[0]
    NCp = -(-NC // 128) * 128
    P = page_size

    if chunk_live is None:
        chunk_live = jnp.ones((NC,), jnp.int32)
    NC8 = -(-NC // 8) * 8
    flags = jnp.zeros((NC8, 128), jnp.int32).at[:NC, 0].set(
        chunk_live.astype(jnp.int32))
    seed2 = jnp.zeros((1, 2), jnp.int32).at[0].set(seed.astype(jnp.int32))
    if grid_live is None:
        grid_n = NC
        live_n = jnp.int32(NC)
    else:
        grid_n = jnp.clip(grid_live.astype(jnp.int32), 1, NC)
        live_n = grid_n

    # --- phase A: prep (chunk-major) ---
    sort_scratch = ([pltpu.VMEM((RB, RB), BF16), pltpu.VMEM((RB, RB), F32)]
                    if sort_lanes
                    else [pltpu.VMEM((8, 128), BF16),
                          pltpu.VMEM((8, 128), F32)])
    prm, win0, gm = pl.pallas_call(
        functools.partial(_kernel_bm_prep, ray_chunk=RB, nb8=NB8,
                          sort_lanes=sort_lanes),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(grid_n,),
            in_specs=[
                pl.BlockSpec((8, 128), lambda i: (i // 8, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((8, RB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NB8, PACK_LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((8, RB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((WN_ROWS, RB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NB8, 128), lambda i: (0, i // 128),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=sort_scratch,
        ),
        out_shape=[jax.ShapeDtypeStruct((8, R), F32),
                   jax.ShapeDtypeStruct((WN_ROWS, R), F32),
                   jax.ShapeDtypeStruct((NB8, NCp), jnp.int32)],
        interpret=interpret,
    )(flags, state.astype(F32), bank_ab)

    # --- phase B: glue (chunk x bank scale, no ray-scale ops) ---
    # QUAD aggregation: the sweep visits BANKS_PER_STEP banks per grid
    # step, so the demand list / chunk order / visit counts are per QUAD
    # (OR of its banks' demand), while the per-(bank, group) gate bits
    # stay per bank, gathered into the quad's chunk order.
    BPS = BANKS_PER_STEP
    NQ = -(-NB // BPS)
    ci = jax.lax.broadcasted_iota(jnp.int32, (NQ, NC), 1)
    gq = gm[:NQ * BPS, :NC].reshape(NQ, BPS, NC)
    dmq = jnp.any(gq != 0, axis=1) & (ci < live_n)           # [NQ, NC]
    ccount = jnp.sum(dmq, axis=1).astype(jnp.int32)          # [NQ]
    order = jnp.argsort(jnp.where(dmq, 0, 1), axis=1,
                        stable=True).astype(jnp.int32)       # demand-first
    gmlq = jnp.take_along_axis(gq, order[:, None, :], axis=2)
    NQ8 = -(-NQ // 8) * 8
    NQB8 = -(-(NQ * BPS) // 8) * 8
    cc8 = jnp.zeros((NQ8, 128), jnp.int32).at[:NQ, 0].set(ccount)
    NCs = -(-NC // 128) * 128
    cl_s = jnp.zeros((NQ8, NCs), jnp.int32).at[:NQ, :NC].set(order)
    gm_s = jnp.zeros((NQB8, NCs), jnp.int32).at[:NQ * BPS, :NC].set(
        gmlq.reshape(NQ * BPS, NC))

    # --- phase C: bank-major sweep (quad grid) ---
    win = pl.pallas_call(
        functools.partial(_kernel_bm_sweep, page_size=P, ray_chunk=RB,
                          nb8=NB8, bps=BPS),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(NQ,),
            in_specs=[
                pl.BlockSpec((8, 128), lambda i: (i // 8, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((8, NCs), lambda i: (i // 8, 0),
                             memory_space=pltpu.SMEM),
                # 8 // BPS steps' per-bank gate rows per 8-row SMEM block
                pl.BlockSpec((8, NCs), lambda i: (i // (8 // BPS), 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((BPS * GROUP, PACK_LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BPS, N_INT * P, GROUP), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BPS, N_SHD * P, GROUP), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            scratch_shapes=[
                pltpu.VMEM((8, RB), F32),                    # pr0
                pltpu.VMEM((8, RB), F32),                    # pr1
                pltpu.VMEM((WN_ROWS, RB), F32),              # wn0
                pltpu.VMEM((WN_ROWS, RB), F32),              # wn1
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((WN_ROWS, R), F32)],
        input_output_aliases={7: 0},
        interpret=interpret,
    )(cc8, cl_s, gm_s, ab, plt_i, plt_s, prm, win0)[0]

    # --- phase D: finish (chunk-major): unsort + shade (no tables) ---
    out = pl.pallas_call(
        functools.partial(_kernel_bm_finish, ray_chunk=RB,
                          fixed_rng=fixed_rng,
                          weight_cutoff=weight_cutoff,
                          sort_lanes=sort_lanes),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(grid_n,),
            in_specs=[
                pl.BlockSpec((8, 128), lambda i: (i // 8, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 2), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((STATE_ROWS, RB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, RB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((WN_ROWS, RB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[pl.BlockSpec((STATE_ROWS, RB), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)],
            scratch_shapes=[],
        ),
        out_shape=[jax.ShapeDtypeStruct((STATE_ROWS, R), F32)],
        input_output_aliases={2: 0},
        interpret=interpret,
    )(flags, seed2, state.astype(F32), prm, win)[0]
    return out
