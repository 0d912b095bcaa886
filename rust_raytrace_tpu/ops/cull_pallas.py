"""Pallas exact packet-cull kernel.

Computes the same (mask, tmin) as ops.cull.cull_mask_exact — per-ray slab
tests against every page AABB, OR/min-reduced per ray chunk — but as ONE
kernel with grid (NC,) instead of a 105-step `lax.map` (the XLA form spends
most of its time on scheduling the map; measured ~37 ms/wave on teapot_2k
where the arithmetic is worth single-digit ms).

Tile orientation: pages on SUBLANES x rays on LANES ([NPpad, RB] tiles), so
per-page AABB scalars broadcast as [NPpad, 1] columns against [1, RB] ray
rows — the same rank-1 broadcast-FMA shape as the intersect kernel.  The
final any/min reductions fold over LANES (the slow orientation), but they are
2 ops of ~30 per pair.

d == 0 slab semantics use the finite-big reciprocal trick: inv = +-1e30
instead of +-inf, so (lo - o) * inv never produces NaN (0 * 1e30 == 0).  For
a ray with d_k == 0 whose origin is outside the slab on axis k this yields a
spurious non-empty [big, bigger] interval — i.e. the test stays CONSERVATIVE
(never discards a hittable page; reference slab semantics ignore d==0 axes
entirely, raytrace.rs:861-907) without the NaN hazard the XLA oracle guards
against explicitly.

Dead chunks (no live ray) are skipped via an SMEM flag — with wavefront
compaction the live rays occupy a prefix of the array, so trailing chunks
cost one predicated branch each.

Reference role: this replaces the per-ray host octree query
get_all_objects_for_ray (raytrace.rs:1052-1077) at chunk granularity.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
BIG = 1e30


BIGT = 3.0e38    # finite "miss" key so one-hot sums stay NaN-free


def _kernel_sorted(flags_ref, o_ref, d_ref, v_ref, lo_ref, hi_ref,
                   cnt_ref, plist_ref, ptmin_ref):
    """Cull + in-kernel front-to-back page sort, one chunk per grid step.

    XLA's argsort on the [NC, NP] tmin matrix measured ~31 ms/wave on chip —
    more than the cull arithmetic itself — so the sort happens here with a
    one-hot rank matrix: rank[p] = #{p': (key', p') < (key, p)} via one
    [NPpad, NPpad] compare (keys are the conservative entry distances,
    misses pushed to the back with a finite BIG key), then plist/ptmin are
    extracted with masked one-hot reductions.  ~3 * NPpad^2 VPU ops per
    chunk — noise next to the slab tests.

    Outputs (row i % 8 of [8, *] blocks): cnt (lane 0), plist [NPpad],
    ptmin [NPpad] — exactly the trace kernel's meta contract.
    """
    row = jax.lax.rem(pl.program_id(0), 8)
    npad = plist_ref.shape[1]

    @pl.when(flags_ref[row, 0] == 0)
    def _dead():
        cnt_ref[row, :] = jnp.zeros((cnt_ref.shape[1],), F32)
        plist_ref[row, :] = jnp.zeros((npad,), F32)
        ptmin_ref[row, :] = jnp.full((npad,), F32(BIGT))

    @pl.when(flags_ref[row, 0] != 0)
    def _live():
        valid = v_ref[0:1, :] != 0.0                    # [1, RB]
        tlo = None
        thi = None
        for k in range(3):
            o_k = o_ref[k:k + 1, :]
            d_k = d_ref[k:k + 1, :]
            inv = jnp.where(d_k != 0.0, 1.0 / d_k,
                            jnp.where(d_k >= 0.0, F32(BIG), F32(-BIG)))
            lo_k = lo_ref[:, k:k + 1]
            hi_k = hi_ref[:, k:k + 1]
            t1 = (lo_k - o_k) * inv
            t2 = (hi_k - o_k) * inv
            alo = jnp.minimum(t1, t2)
            ahi = jnp.maximum(t1, t2)
            tlo = alo if tlo is None else jnp.maximum(tlo, alo)
            thi = ahi if thi is None else jnp.minimum(thi, ahi)

        # lane 3 of lo: 1.0 for real pages, 0.0 for NP..NPpad padding (an
        # inverted AABB does NOT yield an empty slab interval under the
        # min/max formulation, so padding needs an explicit flag)
        page_ok = lo_ref[:, 3:4] != 0.0                 # [NPpad, 1]
        hit = (tlo <= thi) & (thi >= 0.0) & valid & page_ok
        entry = jnp.where(hit, jnp.maximum(tlo, 0.0), F32(BIGT))
        hit_s = jnp.max(hit.astype(F32), axis=1, keepdims=True)  # [NPpad, 1]
        key_s = jnp.min(entry, axis=1, keepdims=True)            # [NPpad, 1]
        key_s = jnp.where(hit_s != 0.0, key_s, F32(BIGT))

        cnt_ref[row, :] = jnp.broadcast_to(jnp.sum(hit_s), (cnt_ref.shape[1],))

        # rank-sort the pages by (key, index): key as a lane vector comes
        # from the same reduction relayouted
        key_l = jnp.min(entry, axis=1)[None, :]                  # [1, NPpad]
        hit_l = jnp.max(hit.astype(F32), axis=1)[None, :]
        key_l = jnp.where(hit_l != 0.0, key_l, F32(BIGT))
        sub_i = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), 0)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), 1)
        kb_l = jnp.broadcast_to(key_l, (npad, npad))
        kb_s = jnp.broadcast_to(key_s, (npad, npad))
        less = (kb_l < kb_s) | ((kb_l == kb_s) & (lane_i < sub_i))
        rank_s = jnp.sum(less.astype(F32), axis=1, keepdims=True)  # [NPpad,1]

        onehot = (jnp.broadcast_to(rank_s, (npad, npad))
                  == lane_i.astype(F32))                 # G[p, r]
        page_f = sub_i.astype(F32)
        plist_ref[row, :] = jnp.sum(jnp.where(onehot, page_f, 0.0), axis=0)
        ptmin_ref[row, :] = jnp.sum(
            jnp.where(onehot, jnp.broadcast_to(key_s, (npad, npad)), 0.0),
            axis=0)


@functools.partial(jax.jit, static_argnames=("ray_chunk", "interpret"))
def cull_sorted_pallas(ot, dt, valid, blo, bhi, ray_chunk: int,
                       chunk_live=None, interpret: bool = False):
    """Exact packet cull + front-to-back page ordering, fused in ONE kernel.

    MEASURED SLOWER than cull_mask_exact_pallas + XLA argsort on this
    toolchain (~+40 ms/wave on teapot_2k, scripts/probe_r2f.py: the rank
    block after the slab loop triples the kernel's runtime — XLA argsort on
    the [NC, NP] keys is only ~4 ms).  Kept as a reference implementation;
    the engine uses the split form.

    Returns (counts [NC] int32, plist [NC, NPpad] int32, ptmin [NC, NPpad]
    f32) — the trace kernel's page-list contract (plist rows list surviving
    pages first, ordered by conservative entry distance; positions >= count
    are meaningless; ptmin uses a finite BIG for misses).
    """
    RB = ray_chunk
    R = ot.shape[1]
    NC = R // RB
    NP = blo.shape[0]
    NPpad = -(-NP // 128) * 128

    lo = jnp.zeros((NPpad, 128), F32).at[:NP, 0:3].set(blo.astype(F32))
    hi = jnp.zeros((NPpad, 128), F32).at[:NP, 0:3].set(bhi.astype(F32))
    lo = lo.at[:NP, 3].set(1.0)     # page-valid flag (padding stays 0)

    if chunk_live is None:
        chunk_live = jnp.ones((NC,), jnp.int32)
    NC8 = -(-NC // 8) * 8
    flags = jnp.zeros((NC8, 128), jnp.int32).at[:NC, 0].set(
        chunk_live.astype(jnp.int32))
    vrow = valid.astype(F32)[None, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(NC,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((3, RB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((NPpad, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NPpad, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, 128), lambda i: (i // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, NPpad), lambda i: (i // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, NPpad), lambda i: (i // 8, 0),
                         memory_space=pltpu.VMEM),
        ],
    )

    cnt_f, plist_f, ptmin = pl.pallas_call(
        _kernel_sorted,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((NC8, 128), F32),
            jax.ShapeDtypeStruct((NC8, NPpad), F32),
            jax.ShapeDtypeStruct((NC8, NPpad), F32),
        ],
        interpret=interpret,
    )(flags, ot.astype(F32), dt.astype(F32), vrow, lo, hi)

    counts = cnt_f[:NC, 0].astype(jnp.int32)
    plist = plist_f[:NC].astype(jnp.int32)
    return counts, plist, ptmin[:NC]


def _slab_rows(lo_rows, hi_rows, o_ref, d_ref):
    """Slab intervals of the given AABB rows vs this chunk's rays:
    (tlo, thi) each [rows, RB]."""
    tlo = None
    thi = None
    for k in range(3):
        o_k = o_ref[k:k + 1, :]                         # [1, RB]
        d_k = d_ref[k:k + 1, :]
        inv = jnp.where(d_k != 0.0, 1.0 / d_k,
                        jnp.where(d_k >= 0.0, F32(BIG), F32(-BIG)))
        lo_k = lo_rows[:, k:k + 1]                      # [rows, 1]
        hi_k = hi_rows[:, k:k + 1]
        t1 = (lo_k - o_k) * inv                         # [rows, RB]
        t2 = (hi_k - o_k) * inv
        alo = jnp.minimum(t1, t2)
        ahi = jnp.maximum(t1, t2)
        tlo = alo if tlo is None else jnp.maximum(tlo, alo)
        thi = ahi if thi is None else jnp.minimum(thi, ahi)
    return tlo, thi


def _kernel(flags_ref, o_ref, d_ref, v_ref, lo_ref, hi_ref, lob_ref,
            hib_ref, mask_ref, tmin_ref, smask, stmin, *, nb: int):
    """One chunk vs all pages.  lo/hi: [NPpad, 128] VMEM (lanes 0..2 = xyz);
    lob/hib: [16, 128] BANK AABBs (union boxes of each 128-page block).
    Outputs are [8, NPpad] blocks shared by 8 consecutive chunks (Mosaic
    requires sublane-dim-8 blocks); this chunk writes row i % 8.

    nb > 1: each 128-page bank's fine slab runs only if some ray of the
    chunk enters the bank's AABB — page boxes are subsets and f32 slab
    bounds are monotone in the box planes, so skipped banks provably have
    mask 0 (conservative-exact; same outputs as the ungated form).  At
    NP = 1784 the ungated slab was 55 ms/render (probe_r3j)."""
    row = jax.lax.rem(pl.program_id(0), 8)

    @pl.when(flags_ref[row, 0] == 0)
    def _dead():
        mask_ref[row, :] = jnp.zeros((mask_ref.shape[1],), F32)
        tmin_ref[row, :] = jnp.full((tmin_ref.shape[1],), jnp.inf, F32)

    @pl.when(flags_ref[row, 0] != 0)
    def _live():
        valid = v_ref[0:1, :] != 0.0                    # [1, RB]

        def fine(lo_rows, hi_rows, out_sl, mref, tref, orow):
            tlo, thi = _slab_rows(lo_rows, hi_rows, o_ref, d_ref)
            hit = (tlo <= thi) & (thi >= 0.0) & valid   # [rows, RB]
            entry = jnp.where(hit, jnp.maximum(tlo, 0.0), jnp.inf)
            mref[orow, out_sl] = jnp.max(hit.astype(F32), axis=1)
            tref[orow, out_sl] = jnp.min(entry, axis=1)

        if nb == 1:
            fine(lo_ref[:], hi_ref[:], slice(None), mask_ref, tmin_ref, row)
            return

        # Mosaic can't do a partial-lane store at a DYNAMIC sublane (`row`),
        # so banks stage into scratch row 0 (static) and one full-row store
        # publishes the result.
        tlo_b, thi_b = _slab_rows(lob_ref[:], hib_ref[:], o_ref, d_ref)
        ent_b = (tlo_b <= thi_b) & (thi_b >= 0.0) & valid   # [16, RB]
        for b in range(nb):
            sl = slice(b * 128, (b + 1) * 128)

            @pl.when(jnp.any(ent_b[b:b + 1, :]))
            def _bank(b=b, sl=sl):
                fine(lo_ref[sl], hi_ref[sl], sl, smask, stmin, 0)

            @pl.when(jnp.logical_not(jnp.any(ent_b[b:b + 1, :])))
            def _skip(sl=sl):
                smask[0, sl] = jnp.zeros((128,), F32)
                stmin[0, sl] = jnp.full((128,), jnp.inf, F32)

        mask_ref[row, :] = smask[0, :]
        tmin_ref[row, :] = stmin[0, :]


@functools.partial(jax.jit, static_argnames=("ray_chunk", "interpret"))
def cull_mask_exact_pallas(ot, dt, valid, blo, bhi, ray_chunk: int,
                           chunk_live=None, interpret: bool = False):
    """Drop-in for ops.cull.cull_mask_exact (same conservative contract).

    ot, dt: [3, R]; valid: [R] bool; blo/bhi: [NP, 3].
    chunk_live: optional [NC] int32/bool — chunks marked 0 are skipped
    entirely (their mask is empty).  Defaults to all-live.
    Returns ([NC, NP] bool mask, [NC, NP] f32 tmin, +inf where miss).
    """
    RB = ray_chunk
    R = ot.shape[1]
    NC = R // RB
    NP = blo.shape[0]
    NPpad = -(-NP // 128) * 128

    lo = jnp.zeros((NPpad, 128), F32).at[:NP, 0:3].set(blo.astype(F32))
    hi = jnp.zeros((NPpad, 128), F32).at[:NP, 0:3].set(bhi.astype(F32))
    # padding pages: empty AABB (+inf lo, -inf hi) -> never hit
    lo = lo.at[NP:, 0:3].set(jnp.inf)
    hi = hi.at[NP:, 0:3].set(-jnp.inf)

    # bank AABBs: union box of each 128-page block (exact f32 min/max);
    # rows >= NB are empty boxes
    NB = NPpad // 128
    lob = jnp.full((16, 128), jnp.inf, F32).at[:NB, 0:3].set(
        lo[:, 0:3].reshape(NB, 128, 3).min(axis=1))
    hib = jnp.full((16, 128), -jnp.inf, F32).at[:NB, 0:3].set(
        hi[:, 0:3].reshape(NB, 128, 3).max(axis=1))

    if chunk_live is None:
        chunk_live = jnp.ones((NC,), jnp.int32)
    NC8 = -(-NC // 8) * 8
    flags = jnp.zeros((NC8, 128), jnp.int32).at[:NC, 0].set(
        chunk_live.astype(jnp.int32))

    vrow = valid.astype(F32)[None, :]                    # [1, R]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(NC,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((3, RB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((NPpad, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NPpad, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, NPpad), lambda i: (i // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, NPpad), lambda i: (i // 8, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, NPpad), F32),
            pltpu.VMEM((8, NPpad), F32),
        ],
    )

    mask_f, tmin = pl.pallas_call(
        functools.partial(_kernel, nb=NB),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((NC8, NPpad), F32),
            jax.ShapeDtypeStruct((NC8, NPpad), F32),
        ],
        interpret=interpret,
    )(flags, ot.astype(F32), dt.astype(F32), vrow, lo, hi, lob, hib)

    mask = mask_f[:NC, :NP] != 0.0
    return mask, jnp.where(mask, tmin[:NC, :NP], jnp.inf)
