"""Pallas TPU nearest-hit kernels — the hot loop of the renderer.

TPU-native redesign of the reference CUDA kernel `cuda_triangle_intersect`
(cuda_raytrace_lib/src/cuda_rt.cu:145-324).  The CUDA kernel maps 1 block = 1
ray and 1 thread = 1 candidate triangle with a shared-memory log2 min-tree; on
TPU a grid cell is a (ray chunk x triangle page) TILE: the plane-hit and
half-plane terms are rank-1 broadcast FMAs on the 8x128 VPU over a [P, RB]
tile — triangles on SUBLANES, rays on LANES, so the min-reduction over
candidates folds across sublanes in a handful of full-width vector ops
(the lane-major orientation measured ~5x slower).

Why no MXU: the contractions here are K=3 (xyz), and fp32 HIGHEST-precision
matmul on the MXU pads K to a full systolic pass x multiple bf16 passes —
measured ~15x slower than the VPU broadcast form for this shape.

Why no bounding-circle test: see ops/pages.py (the reference's own CUDA kernel
omits it too, cuda_rt.cu:166-256).

Unlike the reference host path, which re-marshals and re-uploads every cycle's
triangle pages (its measured bottleneck — cuda_rt.cu:341-398 vs the 4-phase
timers at :432-440), all pages stay resident in HBM and are streamed through
VMEM — by BlockSpecs (dense variant) or by explicit double-buffered DMA over
per-chunk surviving-page lists (`nearest_hit_pallas_pages`, the production
variant; its page lists are device arrays, so multi-wave renders run with zero
host round trips).

Layout (f32 VMEM tiling is (8,128)):
  rays as [3, R]       — xyz on sublanes (block covers the full dim), rays on
                         lanes; R a multiple of the 128-lane tile;
  pages as PK [NP, P, 128] — packed features (ops/pages.py): every per-
                         triangle quantity is a natural [P, 1] column slice;
  outputs as [NC, 8, RB] — running best kept in [P?]-free scratch [8, RB] and
                         broadcast across the 8 sublane rows (row 0 read back).

Miss sentinel: best_id 0 and best_t +inf (contract of cuda_rt.cu:313-323).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pages import (LANE_ALPHA, LANE_COLOR, LANE_ET, LANE_ID, LANE_KIND,
                    LANE_N, LANE_NC, LANE_S0, LANE_S0C, LANE_S1, LANE_S1C,
                    LANE_S2, LANE_S2C, LANE_SCAT)

F32 = jnp.float32

DEFAULT_RAY_CHUNK = 1024

#: rows of the trace kernel's per-ray output block [16, RB]
ROW_T = 0        # best hit time (+inf miss; -inf on invalid/padding lanes)
ROW_ID = 1       # winning triangle id (0 miss)
ROW_NORM = 2     # 2..4: winner plane normal
ROW_ENC = 5      # kind + 4*edge + 8*back of the winner
ROW_COLOR = 6    # 6..8: winner material color
ROW_ALPHA = 9
ROW_SCAT = 10
TRACE_ROWS = 16


def packed_hit_predicate(col, o3, d3, has=None, excl=None, *,
                         zero_origin: bool = False):
    """The packed-triangle hit arithmetic — the ONE source of truth shared
    by every kernel family (union/dense here, per-lane banked in
    intersect_perlane, HBM-streamed in intersect_streamed).  The engine's
    bit-exactness contract (engine == xla at max|diff| 0.0,
    tests/test_bitexact.py) requires these kernels to produce bitwise
    identical hit terms, so the arithmetic lives in exactly one place.

    Semantic reference: the reference's plane-hit + incenter half-plane
    test (raytrace.rs:377-436; CUDA form cuda_rt.cu:145-256), refactored
    into per-triangle packed scalars (ops/pages.py lane layout).

    col(f): accessor returning the feature-f tile — [P, 1] page columns in
    the union kernel, [P, 128] gathered rows in the per-lane/streamed
    kernels; either broadcasts against the [1, lanes] ray rows.
    o3/d3: (x, y, z) tuples of [1, lanes] ray rows.  has: optional bool
    mask AND-ed into ok (per-lane gather-valid).  excl: optional [1,
    lanes] excluded triangle id (shadow self-exclusion; id 0 excludes
    nothing because padding slots never hit).  zero_origin: the caller
    folded the o-dot terms into the NC/S*C scalars (fold_pages_origin).

    Returns (t, ok, ids, md_n, (dv0, dv1, dv2)).
    """
    o0, o1, o2 = o3
    d0, d1, d2 = d3

    def dot3(f, r0, r1, r2):
        return col(f) * r0 + col(f + 1) * r1 + col(f + 2) * r2

    md_n = dot3(LANE_N, d0, d1, d2)
    if zero_origin:
        t = col(LANE_NC) / md_n
        dv0 = t * dot3(LANE_S0, d0, d1, d2) - col(LANE_S0C)
        dv1 = t * dot3(LANE_S1, d0, d1, d2) - col(LANE_S1C)
        dv2 = t * dot3(LANE_S2, d0, d1, d2) - col(LANE_S2C)
    else:
        t = (col(LANE_NC) - dot3(LANE_N, o0, o1, o2)) / md_n
        dv0 = dot3(LANE_S0, o0, o1, o2) \
            + t * dot3(LANE_S0, d0, d1, d2) - col(LANE_S0C)
        dv1 = dot3(LANE_S1, o0, o1, o2) \
            + t * dot3(LANE_S1, d0, d1, d2) - col(LANE_S1C)
        dv2 = dot3(LANE_S2, o0, o1, o2) \
            + t * dot3(LANE_S2, d0, d1, d2) - col(LANE_S2C)

    ids = col(LANE_ID)
    ok = (t >= 0.0) & (dv0 <= 1.0) & (dv1 <= 1.0) & (dv2 <= 1.0)
    if has is not None:
        ok = ok & has
    if excl is not None:
        ok = ok & (ids != excl)
    return t, ok, ids, md_n, (dv0, dv1, dv2)


def _predicate_update(pk, o_ref, d_ref, t_ref, id_ref, page_size: int):
    """One (page x ray chunk) tile: hit predicate + running-min update.

    pk: [P, 128] packed page (VMEM value).  o_ref/d_ref: [3, RB] ray blocks.
    t_ref/id_ref: [.., 8, RB] running best output blocks (all sublane rows
    carry the same values; [1, RB] page results broadcast right-aligned).
    """
    o3 = tuple(o_ref[k:k + 1, :] for k in range(3))      # [1, RB] rows
    d3 = tuple(d_ref[k:k + 1, :] for k in range(3))

    def col(lane):
        return pk[:, lane:lane + 1]                      # [P, 1]

    t, valid, _, _, _ = packed_hit_predicate(col, o3, d3)
    tt = jnp.where(valid, t, jnp.inf)

    page_min = jnp.min(tt, axis=0, keepdims=True)        # [1, RB]
    page_id = jnp.min(jnp.where(tt == page_min, col(LANE_ID), jnp.inf),
                      axis=0, keepdims=True)             # smallest id on tie

    best_t = t_ref[:]
    # lexicographic (t, id): cross-page ties to the smallest id
    upd = (page_min < best_t) | ((page_min == best_t)
                                 & ~jnp.isinf(page_min)
                                 & (page_id < id_ref[:]))
    t_ref[:] = jnp.where(upd, jnp.broadcast_to(page_min, best_t.shape), best_t)
    id_ref[:] = jnp.where(upd, jnp.broadcast_to(page_id, best_t.shape),
                          id_ref[:])


def _init_out(t_ref, id_ref):
    t_ref[:] = jnp.full_like(t_ref, jnp.inf)
    id_ref[:] = jnp.zeros_like(id_ref)


def _kernel(o_ref, d_ref, pk_ref, t_ref, id_ref, *, page_size: int):
    @pl.when(pl.program_id(1) == 0)
    def _():
        _init_out(t_ref, id_ref)

    _predicate_update(pk_ref[0], o_ref, d_ref, t_ref, id_ref, page_size)


@functools.partial(jax.jit, static_argnames=("page_size", "ray_chunk",
                                             "interpret"))
def nearest_hit_pallas(O, D, PK, page_size: int,
                       ray_chunk: int = DEFAULT_RAY_CHUNK,
                       interpret: bool = False):
    """Dense variant: every ray chunk visits every page (brute force).

    O, D: [R, 3] f32 (R padded to a multiple of `ray_chunk` internally).
    Returns (best_t [R] f32 +inf-miss, best_id [R] int32 0-miss).
    """
    R = O.shape[0]
    NP = PK.shape[0]
    RB = ray_chunk
    NC = -(-R // RB)
    Rpad = NC * RB

    # Padding rays get direction zero -> t = NaN or +-inf -> never valid.
    OT = jnp.zeros((3, Rpad), F32).at[:, :R].set(O.T.astype(F32))
    DT = jnp.zeros((3, Rpad), F32).at[:, :R].set(D.T.astype(F32))

    grid = (NC, NP)
    best_t, best_id = pl.pallas_call(
        functools.partial(_kernel, page_size=page_size),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, RB), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RB), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, page_size, 128), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, RB), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, RB), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NC, 8, RB), F32),
            jax.ShapeDtypeStruct((NC, 8, RB), F32),
        ],
        interpret=interpret,
    )(OT, DT, PK)

    best_t = best_t[:, 0, :].reshape(-1)[:R]
    best_id = best_id[:, 0, :].reshape(-1)[:R]
    return best_t, best_id.astype(jnp.int32)


@jax.jit
def fold_pages_origin(PK, origin):
    """Fold a shared ray origin into the page plane/half-plane scalars.

    With o fixed, t = (n.c - n.o)/(n.d) and dist_k = t (d.s'k) - (s'k.c -
    s'k.o): the four o-dot terms become per-triangle constants.  Returns PK
    with lanes NC/S0C/S1C/S2C adjusted so the kernel can run with
    zero_origin=True and rays re-anchored at `origin`.
    """
    def fold(lane_c, lane_v):
        adj = (PK[..., lane_v] * origin[0] + PK[..., lane_v + 1] * origin[1]
               + PK[..., lane_v + 2] * origin[2])
        return PK[..., lane_c] - adj

    return PK.at[..., LANE_NC].set(fold(LANE_NC, LANE_N)) \
             .at[..., LANE_S0C].set(fold(LANE_S0C, LANE_S0)) \
             .at[..., LANE_S1C].set(fold(LANE_S1C, LANE_S1)) \
             .at[..., LANE_S2C].set(fold(LANE_S2C, LANE_S2))


def _kernel_trace(meta_ref, ptmin_ref, o_ref, d_ref, *rest, page_size: int,
                  zero_origin: bool = False, nbuf: int = 2,
                  exclude_id: bool = False):
    """Grid = (NC,): trace one ray chunk through ONLY its surviving pages.

    Streams pages front-to-back with double-buffered HBM->VMEM DMA, keeps the
    running winner STATE (t, id, normal, enc, material) in VMEM scratch S
    [16, RB] via masked sublane reductions, and early-exits the page loop once
    every lane's best hit is closer than the next page's conservative entry
    distance — the chunk-granular form of the reference's front-to-back
    skip (raytrace.rs:941-965), which its GPU path had disabled
    (`|| true`, cuda_raytrace.rs:441).

    meta_ref: [8, 1+NP] SMEM int32 (8 chunk rows; ours is row i%8): col 0 =
    surviving-page count, cols 1.. = page ids front-to-back.  ptmin_ref:
    [8, NP] SMEM f32: the matching conservative page entry distances.

    Winner feature extraction: on pages where some lane improves, a one-hot
    mask (tt == page_min AND id == page_id) reduces each feature over the
    sublane (triangle) axis — this is why shading needs NO device gathers.
    Invalid lanes (zero direction) get best_t = -inf so they can never block
    the early exit.

    With `exclude_id`, an extra [1, RB] input carries a per-lane triangle id
    that can never win (the shadow-ray origin triangle: the occlusion query
    tests "any OTHER triangle", oracle.is_shadowed / raytrace.rs:1204-1224).
    Id 0 excludes nothing (padding rows never hit).
    """
    if exclude_id:
        excl_ref, pk_hbm, out_ref, S, pk_buf, sem = rest
    else:
        pk_hbm, out_ref, S, pk_buf, sem = rest
    _trace_pages(meta_ref, ptmin_ref, o_ref[:], d_ref[:],
                 excl_ref[0:1, :] if exclude_id else None, pk_hbm, S,
                 pk_buf, sem, page_size=page_size, zero_origin=zero_origin,
                 nbuf=nbuf, row=jax.lax.rem(pl.program_id(0), 8))
    out_ref[:] = S[:]


def _trace_pages(meta_ref, ptmin_ref, o_v, d_v, excl_v, pk_hbm, S, pk_buf,
                 sem, *, page_size: int, zero_origin: bool, nbuf: int, row):
    """The page-streaming trace loop of _kernel_trace, factored so the fused
    trace+shade kernel below shares it verbatim.  Winner state lands in the
    S scratch [16, RB].  `row` (the chunk's SMEM row, program_id % 8) is an
    ARGUMENT because this body may run inside a pl.when region, where the
    HLO-interpret lowering cannot evaluate pl.program_id — callers read it
    at kernel top level."""
    P = page_size
    n = meta_ref[row, 0]

    o0, o1, o2 = (o_v[k:k + 1, :] for k in range(3))     # [1, RB]
    d0r, d1r, d2r = (d_v[k:k + 1, :] for k in range(3))
    lane_valid = (d0r != 0.0) | (d1r != 0.0) | (d2r != 0.0)

    S[0:1, :] = jnp.where(lane_valid, jnp.inf, -jnp.inf)     # ROW_T
    S[1:TRACE_ROWS, :] = jnp.zeros_like(S[1:TRACE_ROWS, :])  # ROW_ID.. = 0

    NBUF = nbuf   # page DMA depth (2 = classic double buffering)

    def dma(slot, k):
        p = meta_ref[row, 1 + k]
        return pltpu.make_async_copy(pk_hbm.at[p], pk_buf.at[slot],
                                     sem.at[slot])

    for w in range(NBUF - 1):
        @pl.when(w < n)
        def _warmup(w=w):
            dma(w, w).start()

    def cond(carry):
        k, done = carry
        return (k < n) & jnp.logical_not(done)

    def body(carry):
        k, _ = carry
        slot = jax.lax.rem(k, NBUF)

        @pl.when(k + NBUF - 1 < n)
        def _prefetch():
            dma(jax.lax.rem(k + NBUF - 1, NBUF), k + NBUF - 1).start()

        dma(slot, k).wait()
        pk = pk_buf[slot]

        def col(lane):
            return pk[:, lane:lane + 1]                      # [P, 1]

        # shared-origin fast path (zero_origin): the caller folded the
        # o-dot terms into the page scalars (lanes NC/S*C adjusted by
        # -feature.origin), so four of the eight per-pair 3-term dot
        # products vanish inside the shared predicate
        t, hit, _, md_n, (dv0, dv1, dv2) = packed_hit_predicate(
            col, (o0, o1, o2), (d0r, d1r, d2r), excl=excl_v,
            zero_origin=zero_origin)
        tt = jnp.where(hit, t, jnp.inf)

        page_min = jnp.min(tt, axis=0, keepdims=True)        # [1, RB]
        page_id = jnp.min(jnp.where(tt == page_min, col(LANE_ID), jnp.inf),
                          axis=0, keepdims=True)

        best = S[0:1, :]
        # Lexicographic (t, id) winner: cross-page ties break to the SMALLEST
        # triangle id (the oracle's argmin tie rule, raytrace.rs:1029-1038),
        # making the result independent of page visit order and of which
        # chunk a ray lands in (compaction moves rays between chunks).
        upd = (page_min < best) | ((page_min == best) & ~jnp.isinf(page_min)
                                   & (page_id < S[1:2, :]))

        @pl.when(jnp.any(upd))
        def _extract():
            mask = ((tt == page_min) & (col(LANE_ID) == page_id)).astype(F32)

            # per-candidate edge band + face side (raytrace.rs:415-436)
            inv_et = 1.0 - col(LANE_ET)
            edge = (dv0 > inv_et) | (dv1 > inv_et) | (dv2 > inv_et)
            back = md_n > 0.0
            enc = (col(LANE_KIND) + 4.0 * edge.astype(F32)
                   + 8.0 * back.astype(F32))

            def ext(v):                                      # [1, RB]
                return jnp.sum(mask * v, axis=0, keepdims=True)

            for r, v in (
                (ROW_NORM, col(LANE_N)), (ROW_NORM + 1, col(LANE_N + 1)),
                (ROW_NORM + 2, col(LANE_N + 2)), (ROW_ENC, enc),
                (ROW_COLOR, col(LANE_COLOR)),
                (ROW_COLOR + 1, col(LANE_COLOR + 1)),
                (ROW_COLOR + 2, col(LANE_COLOR + 2)),
                (ROW_ALPHA, col(LANE_ALPHA)), (ROW_SCAT, col(LANE_SCAT)),
            ):
                S[r:r + 1, :] = jnp.where(upd, ext(v), S[r:r + 1, :])

        S[0:1, :] = jnp.where(upd, page_min, best)
        S[1:2, :] = jnp.where(upd, page_id, S[1:2, :])

        # Early exit: every lane's best beats the next page's entry bound.
        chunk_max = jnp.max(S[0:1, :])
        done = jnp.where(k + 1 < n,
                         chunk_max < ptmin_ref[row, jnp.minimum(k + 1, n - 1)],
                         False)
        return (k + 1, done)

    k_f, done_f = jax.lax.while_loop(cond, body, (jnp.int32(0), False))

    # Prefetched DMAs for pages k_f..k_f+NBUF-2 may still be in flight on
    # early exit; drain them before the next grid step reuses the buffers.
    for w in range(NBUF - 1):
        @pl.when(done_f & (k_f + w < n))
        def _drain(w=w):
            dma(jax.lax.rem(k_f + w, NBUF), k_f + w).wait()


def _kernel_trace_shade(*refs, page_size: int, zero_origin: bool, nbuf: int,
                        fixed_rng: bool, weight_cutoff: float,
                        skippable: bool):
    """Fused union trace + shade: the page-streaming trace followed by the
    wave's shading/scatter/state update while the winner rows sit in the S
    scratch — used for wave 0 and for bounce waves in the beyond-table-
    budget fallback regime (engine routes bounces here when the per-lane
    tables exceed the VMEM slot cap).  st/out: ops.compact state blocks
    [16, RB].

    skippable (static, = caller passed chunk_live/grid_live): the kernel
    takes a flags_ref carrying per-chunk liveness, and retired chunks are
    identity pass-throughs (state aliases the output), exactly the
    per-lane kernel's skip — on fallback bounce waves most chunks are
    dead, and the skip spares their trace+shade entirely.  When NOT
    skippable (wave 0: all chunks live by construction) the body is
    straight-line — wrapping the page-stream DMA while-loop in a pl.when
    region costs Mosaic scheduling for a flag that never fires (the
    round-4 always-skippable version measured the teapot_2k headline
    64.3 -> 60.8 Mrays/s; pl.when program-shape overhead is a documented
    pattern, docs/PERF.md probe_r6c)."""
    from .shade import _shade_state_rows, scatter_rv

    if skippable:
        (flags_ref, meta_ref, ptmin_ref, seed_ref, st_ref, pk_hbm,
         out_ref, S, pk_buf, sem) = refs
    else:
        (meta_ref, ptmin_ref, seed_ref, st_ref, pk_hbm,
         out_ref, S, pk_buf, sem) = refs

    pid = pl.program_id(0)
    row = jax.lax.rem(pid, 8)

    def _body():
        st = st_ref[:]
        _trace_pages(meta_ref, ptmin_ref, st[0:3], st[3:6], None, pk_hbm, S,
                     pk_buf, sem, page_size=page_size,
                     zero_origin=zero_origin, nbuf=nbuf, row=row)
        rv0, rv1, rv2 = scatter_rv(seed_ref[0, 0], seed_ref[0, 1], pid,
                                   st.shape[1], fixed_rng)
        out_ref[:] = _shade_state_rows(st, S[:], rv0, rv1, rv2, None,
                                       weight_cutoff)

    if not skippable:
        _body()
        return

    live = flags_ref[row, 0] != 0

    @pl.when(jnp.logical_not(live))
    def _skip():
        out_ref[:] = st_ref[:]

    @pl.when(live)
    def _busy():
        _body()


@functools.partial(jax.jit, static_argnames=("page_size", "ray_chunk",
                                             "interpret", "zero_origin",
                                             "nbuf"))
def trace_chunks_pallas(OT, DT, PK, counts, plist, ptmin,
                        page_size: int, ray_chunk: int,
                        interpret: bool = False, zero_origin: bool = False,
                        nbuf: int = 2, excl=None):
    """Trace + winner-state extraction over per-chunk page lists, ON DEVICE.

    The production form on remote/tunneled TPUs: `counts`/`plist`/`ptmin` are
    device arrays (from the packet cull), so the whole multi-wave render stays
    a single dispatch chain with no host round trips, no gathers, and no
    scatters.

    OT, DT: [3, R] with R a multiple of ray_chunk (xyz-major — [R, 3] arrays
    lane-pad 42x on TPU and must never exist on device).  counts: [NC] int32.
    plist: [NC, NP] int32 — surviving pages first, front-to-back.
    ptmin: [NC, NP] f32 — conservative entry distance per listed page.
    excl: optional [1, R] f32 — per-ray triangle id excluded from hitting
    (shadow-ray self-exclusion; 0 = exclude nothing).
    Returns OUT [16, R] (rows ROW_*; see module constants).
    """
    RB = ray_chunk
    R = OT.shape[1]
    NC = R // RB
    NP = PK.shape[0]

    NC8 = -(-NC // 8) * 8
    meta = jnp.zeros((NC8, 1 + NP), jnp.int32)
    meta = meta.at[:NC, 0].set(counts.astype(jnp.int32))
    meta = meta.at[:NC, 1:].set(plist.astype(jnp.int32))
    ptm = jnp.full((NC8, NP), jnp.inf, F32).at[:NC].set(ptmin.astype(F32))

    exclude_id = excl is not None
    in_specs = [
        pl.BlockSpec((8, 1 + NP), lambda i: (i // 8, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((8, NP), lambda i: (i // 8, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((3, RB), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, RB), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    args = [meta, ptm, OT.astype(F32), DT.astype(F32)]
    if exclude_id:
        in_specs.append(pl.BlockSpec((1, RB), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
        args.append(excl.astype(F32))
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # PK stays in HBM
    args.append(PK)

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
            pltpu.VMEM((nbuf, page_size, 128), F32),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_kernel_trace, page_size=page_size,
                          zero_origin=zero_origin, nbuf=nbuf,
                          exclude_id=exclude_id),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((TRACE_ROWS, R), F32)],
        interpret=interpret,
    )(*args)[0]

    return out


@functools.partial(jax.jit, static_argnames=("page_size", "ray_chunk",
                                             "interpret", "zero_origin",
                                             "nbuf", "fixed_rng",
                                             "weight_cutoff"))
def trace_shade_chunks_pallas(state, PK, counts, plist, ptmin, seed,
                              page_size: int, ray_chunk: int,
                              fixed_rng: bool, weight_cutoff: float,
                              interpret: bool = False,
                              zero_origin: bool = False, nbuf: int = 2,
                              chunk_live=None, grid_live=None):
    """Fused form of trace_chunks_pallas + ops.shade for waves that need no
    shadow pass or primary-row capture: one wave = cull lists -> trace ->
    shade -> state update, with the winner rows never leaving VMEM.

    state: [16, R] ops.compact layout (o rows 0..2 — or the folded pinhole
    when zero_origin — d rows 3..5, alive row 7); seed: [2] uint32.
    Returns the post-wave state [16, R].

    chunk_live: optional [NC] skip flags — retired chunks pass their state
    through untouched (bit-exact: a dead chunk's shade is the identity).
    This matters in the beyond-table-budget fallback regime, where BOUNCE
    waves route through this kernel (engine: plt tables absent) and most
    chunks die after wave 0.  grid_live: optional traced survivor-prefix
    chunk count — a dynamic grid that skips the dead tail entirely (state
    aliases the output so unvisited blocks keep their bits), same contract
    as trace_shade_perlane_pallas.  With BOTH None (wave 0, where every
    chunk is live by construction) the kernel compiles the straight-line
    round-3 program: no flags block, no pl.when, no aliasing — the
    always-skippable round-4 version cost the headline 5.4 ms (see
    _kernel_trace_shade)."""
    RB = ray_chunk
    R = state.shape[1]
    NC = R // RB
    NP = PK.shape[0]

    skippable = chunk_live is not None or grid_live is not None
    NC8 = -(-NC // 8) * 8
    args = []
    in_specs = []
    if skippable:
        if chunk_live is None:
            chunk_live = jnp.ones((NC,), jnp.int32)
        flags = jnp.zeros((NC8, 128), jnp.int32).at[:NC, 0].set(
            chunk_live.astype(jnp.int32))
        args.append(flags)
        in_specs.append(pl.BlockSpec((8, 128), lambda i: (i // 8, 0),
                                     memory_space=pltpu.SMEM))
    meta = jnp.zeros((NC8, 1 + NP), jnp.int32)
    meta = meta.at[:NC, 0].set(counts.astype(jnp.int32))
    meta = meta.at[:NC, 1:].set(plist.astype(jnp.int32))
    ptm = jnp.full((NC8, NP), jnp.inf, F32).at[:NC].set(ptmin.astype(F32))
    seed2 = jnp.zeros((1, 2), jnp.int32).at[0].set(seed.astype(jnp.int32))

    if grid_live is None:
        grid_n = NC
    else:
        grid_n = jnp.clip(grid_live.astype(jnp.int32), 1, NC)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(grid_n,),
        in_specs=in_specs + [
            pl.BlockSpec((8, 1 + NP), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, NP), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TRACE_ROWS, RB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # PK stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((TRACE_ROWS, RB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((TRACE_ROWS, RB), F32),
            pltpu.VMEM((nbuf, page_size, 128), F32),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )

    # state aliases the output ONLY in the skippable shape, where the
    # dynamic-grid tail blocks must keep their input bits (the _skip
    # pass-through's identity); unconditional aliasing makes XLA keep the
    # input buffer live via a copy on the wave-0 hot path
    alias = {len(args) + 3: 0} if skippable else {}
    out = pl.pallas_call(
        functools.partial(_kernel_trace_shade, page_size=page_size,
                          zero_origin=zero_origin, nbuf=nbuf,
                          fixed_rng=fixed_rng, weight_cutoff=weight_cutoff,
                          skippable=skippable),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((TRACE_ROWS, R), F32)],
        input_output_aliases=alias,
        interpret=interpret,
    )(*args, meta, ptm, seed2, state.astype(F32), PK)[0]
    return out
