"""Fused shade + scatter-RNG + state-update kernel (chunk-skipping).

One wave's post-trace work — color_ray's material dispatch and mix_color
accumulation (raytrace.rs:1199-1254), lambertian/reflect scatter-ray
generation (raytrace.rs:278-297), weight-cutoff retirement, and the ray-state
update — previously ran as XLA elementwise + threefry at FULL ray count every
wave (~9 ms/wave at 3.7M rays, most of it PRNG).  With compaction the live
rays of waves >= 1 sit in a short chunk prefix; this kernel runs the whole
phase per chunk and SKIPS retired chunks (flags, like the trace kernels), and
replaces the full-R threefry with the TPU core PRNG seeded per
(key, wave, chunk) — dead chunks pass their state through untouched.

Bit-exactness: under fixed_rng the scatter vector is the same compile-time
constant as engine._shade_rows uses, and every arithmetic expression below
mirrors _shade_rows op-for-op, so the image is bit-identical to the XLA
shade (enforced by tests/test_bitexact.py through the compact engine path).
With live RNG the scatter stream differs from the XLA path's threefry (a
different but equally-valid `random_vec` realization, raytrace.rs:188-192) —
renders are deterministic per (key, wave, chunk) but not bitwise comparable
across backends, exactly like the reference's thread-RNG.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..materials import KIND_MATTE, KIND_REFLECTIVE
from .compact import ROW_ACC, ROW_ALIVE, ROW_DEAD, ROW_W, STATE_ROWS
from .intersect_pallas import (ROW_ALPHA, ROW_COLOR, ROW_ENC, ROW_ID,
                               ROW_NORM, ROW_SCAT, ROW_T, TRACE_ROWS)

F32 = jnp.float32

# A provable-miss "sky shortcut" (slab-test the scattered ray against all
# page AABBs in this kernel; zero entered pages => terminal sky one wave
# early) was built and measured here: it NEVER fires — a bounce ray's origin
# lies on its winning triangle, which is inside its own page's AABB, so every
# scattered ray enters >= 1 page (measured 0.00% at 40k samples) — and the
# [pages, RB] slab test cost ~14 ms/render.  Removed; docs/PERF.md keeps the
# negative result.

#: sky color (128, 180, 255)/255 — raytrace.rs:1264 (CPU value; golden PNGs
#: come from the CPU path, SURVEY §7 quirks)
SKY_R = 128.0 / 255.0
SKY_G = 180.0 / 255.0
SKY_B = 255.0 / 255.0

#: fixed_rng scatter vector: unit(0.36, 0.48, 0.8) == itself (3-4-5 scaled)
FIXED_RV = (0.36, 0.48, 0.8)


def _unit3(v0, v1, v2):
    """Row-wise normalize, same expression as engine._unit_rows."""
    inv = jax.lax.rsqrt(v0 * v0 + v1 * v1 + v2 * v2)
    return v0 * inv, v1 * inv, v2 * inv


def scatter_rv(seed0, seed1, chunk, rb: int, fixed_rng: bool):
    """Scatter direction source (`random_vec`, raytrace.rs:188-192).

    fixed_rng: the compile-time constant shared with engine._shade_rows.
    Otherwise: counter-based per-(key, wave, chunk, lane) uniforms via a
    32-bit integer mixer (the lowbias32 finalizer) — identical bits under
    interpret and Mosaic (pltpu.prng_* has no interpret lowering),
    statistically ample for scatter jitter.
    """
    if fixed_rng:
        return (jnp.full((1, rb), FIXED_RV[0], F32),
                jnp.full((1, rb), FIXED_RV[1], F32),
                jnp.full((1, rb), FIXED_RV[2], F32))
    word = (jax.lax.broadcasted_iota(jnp.uint32, (3, rb), 0)
            * jnp.uint32(rb)
            + jax.lax.broadcasted_iota(jnp.uint32, (3, rb), 1))
    x = word ^ seed1.astype(jnp.uint32)
    x = x * jnp.uint32(747796405) + seed0.astype(jnp.uint32) \
        + chunk.astype(jnp.uint32) * jnp.uint32(2654435761)
    for mul, sh in ((0xED5AD4BB, 17), (0xAC4C1B51, 11), (0x31848BAB, 15)):
        x = x ^ jnp.right_shift(x, jnp.uint32(sh))
        x = x * jnp.uint32(mul)
    x = x ^ jnp.right_shift(x, jnp.uint32(14))
    u = jax.lax.bitcast_convert_type(
        jnp.right_shift(x, jnp.uint32(9)) | jnp.uint32(0x3F800000),
        F32) - 1.0                               # [3, RB] in [0,1)
    v = u - 0.5
    return _unit3(v[0:1], v[1:2], v[2:3])


def _mix32(word, seed0, seed1, chunk, salt: int):
    """lowbias32 finalizer over a counter word (same mixer as scatter_rv,
    decorrelated by `salt`); returns uniforms in [0, 1)."""
    x = word ^ seed1.astype(jnp.uint32)
    x = x * jnp.uint32(747796405) + seed0.astype(jnp.uint32) \
        + chunk.astype(jnp.uint32) * jnp.uint32(2654435761) \
        + jnp.uint32(salt)
    for mul, sh in ((0xED5AD4BB, 17), (0xAC4C1B51, 11), (0x31848BAB, 15)):
        x = x ^ jnp.right_shift(x, jnp.uint32(sh))
        x = x * jnp.uint32(mul)
    x = x ^ jnp.right_shift(x, jnp.uint32(14))
    return jax.lax.bitcast_convert_type(
        jnp.right_shift(x, jnp.uint32(9)) | jnp.uint32(0x3F800000),
        F32) - 1.0


def shadow_uvs(seed0, seed1, chunk, rb: int, fixed_rng: bool):
    """Shadow-feeler jitter (the commented get_shadow_ray design,
    raytrace.rs:600-610): u3 [3, rb] light-point jitter + u1 [1, rb] origin
    offset jitter, all in [0, 1).  fixed_rng pins both at 0.5 — the same
    constants engine._shadow_mask uses, so the fused path stays bit-exact
    with the unfused one under FixedRng."""
    if fixed_rng:
        half = jnp.full((3, rb), 0.5, F32)
        return half, jnp.full((1, rb), 0.5, F32)
    word3 = (jax.lax.broadcasted_iota(jnp.uint32, (3, rb), 0)
             * jnp.uint32(rb)
             + jax.lax.broadcasted_iota(jnp.uint32, (3, rb), 1))
    u3 = _mix32(word3, seed0, seed1, chunk, 0x7EE3D0B1)
    word1 = jax.lax.broadcasted_iota(jnp.uint32, (1, rb), 1)
    u1 = _mix32(word1, seed0, seed1, chunk, 0x51AB7F03)
    return u3, u1


def shade_state_rows(st, rows, rv0, rv1, rv2, shd, weight_cutoff: float):
    """One wave's shade + scatter + state update as a pure function of
    values: st [16, RB] (ops.compact layout), rows [16, RB] trace winner
    rows, rv* [1, RB] scatter source, shd optional [1, RB] shadow mask.
    Returns the new [16, RB] state.  Mirrors engine._shade_rows op-for-op
    (bit-exactness contract) — the standalone shade kernel and the fused
    trace+shade kernel both call THIS, so they cannot drift apart.
    """
    return _shade_state_rows(st, rows, rv0, rv1, rv2, shd, weight_cutoff)


def _shade_state_rows(st, rows, rv0, rv1, rv2, shd, weight_cutoff):
    weight = st[ROW_W:ROW_W + 1]                     # [1, RB]
    valid = st[ROW_ALIVE:ROW_ALIVE + 1] != 0.0
    o = st[0:3]
    d = st[3:6]
    # --- _shade_rows, op-for-op ---
    t = rows[ROW_T:ROW_T + 1]
    miss = rows[ROW_ID:ROW_ID + 1] == 0.0
    n0 = rows[ROW_NORM:ROW_NORM + 1]
    n1 = rows[ROW_NORM + 1:ROW_NORM + 2]
    n2 = rows[ROW_NORM + 2:ROW_NORM + 3]
    enc = rows[ROW_ENC:ROW_ENC + 1]
    # enc = kind + 4*edge + 8*back with small-int values: decode
    # arithmetically (f32 mod/floor don't lower in Mosaic)
    back = enc >= 8.0
    e2 = enc - jnp.where(back, 8.0, 0.0)
    edge = e2 >= 4.0
    kind = e2 - jnp.where(edge, 4.0, 0.0)
    c0 = rows[ROW_COLOR:ROW_COLOR + 1]
    c1 = rows[ROW_COLOR + 1:ROW_COLOR + 2]
    c2 = rows[ROW_COLOR + 2:ROW_COLOR + 3]
    if shd is not None:
        shadowed = shd != 0.0
        c0 = jnp.where(shadowed, 0.0, c0)
        c1 = jnp.where(shadowed, 0.0, c1)
        c2 = jnp.where(shadowed, 0.0, c2)
    alpha = rows[ROW_ALPHA:ROW_ALPHA + 1]
    scat = rows[ROW_SCAT:ROW_SCAT + 1]

    nf0 = jnp.where(back, -n0, n0)
    nf1 = jnp.where(back, -n1, n1)
    nf2 = jnp.where(back, -n2, n2)
    is_scatter = (~miss) & (~edge) & ((kind == KIND_MATTE) |
                                      (kind == KIND_REFLECTIVE))
    is_terminal = valid & ~is_scatter
    scatter_live = valid & is_scatter

    s0 = jnp.where(edge, 0.0, c0)
    s1 = jnp.where(edge, 0.0, c1)
    s2 = jnp.where(edge, 0.0, c2)
    tc0 = jnp.where(miss, F32(SKY_R), s0)
    tc1 = jnp.where(miss, F32(SKY_G), s1)
    tc2 = jnp.where(miss, F32(SKY_B), s2)
    one_m_a = F32(1.0) - alpha
    contrib0 = jnp.where(is_terminal, weight * tc0, 0.0) \
        + jnp.where(scatter_live, weight * c0 * one_m_a, 0.0)
    contrib1 = jnp.where(is_terminal, weight * tc1, 0.0) \
        + jnp.where(scatter_live, weight * c1 * one_m_a, 0.0)
    contrib2 = jnp.where(is_terminal, weight * tc2, 0.0) \
        + jnp.where(scatter_live, weight * c2 * one_m_a, 0.0)
    new_w = jnp.where(scatter_live, weight * alpha, weight)

    p0 = o[0:1] + t * d[0:1]
    p1 = o[1:2] + t * d[1:2]
    p2 = o[2:3] + t * d[2:3]
    m0, m1, m2 = _unit3(nf0 + rv0, nf1 + rv1, nf2 + rv2)
    mo0 = p0 + rv0 * F32(0.001)
    mo1 = p1 + rv1 * F32(0.001)
    mo2 = p2 + rv2 * F32(0.001)
    ddot = jnp.abs(d[0:1] * nf0 + d[1:2] * nf1 + d[2:3] * nf2)
    r0, r1, r2 = _unit3(d[0:1] + 2.0 * nf0 * ddot + rv0 * scat,
                        d[1:2] + 2.0 * nf1 * ddot + rv1 * scat,
                        d[2:3] + 2.0 * nf2 * ddot + rv2 * scat)
    ro0 = p0 + r0 * F32(0.001)
    ro1 = p1 + r1 * F32(0.001)
    ro2 = p2 + r2 * F32(0.001)

    is_matte = kind == KIND_MATTE
    no0 = jnp.where(is_matte, mo0, ro0)
    no1 = jnp.where(is_matte, mo1, ro1)
    no2 = jnp.where(is_matte, mo2, ro2)
    nd0 = jnp.where(is_matte, m0, r0)
    nd1 = jnp.where(is_matte, m1, r1)
    nd2 = jnp.where(is_matte, m2, r2)

    alive2 = scatter_live
    if weight_cutoff > 0.0:
        alive2 = alive2 & (new_w > F32(weight_cutoff))
    died = valid & ~alive2
    alive2_f = jnp.where(alive2, F32(1.0), F32(0.0))

    return jnp.concatenate([
        jnp.where(alive2, no0, o[0:1]),
        jnp.where(alive2, no1, o[1:2]),
        jnp.where(alive2, no2, o[2:3]),
        jnp.where(alive2, nd0, d[0:1]),
        jnp.where(alive2, nd1, d[1:2]),
        jnp.where(alive2, nd2, d[2:3]),
        new_w,
        alive2_f,
        st[ROW_ACC:ROW_ACC + 1] + contrib0,
        st[ROW_ACC + 1:ROW_ACC + 2] + contrib1,
        st[ROW_ACC + 2:ROW_ACC + 3] + contrib2,
        jnp.maximum(st[ROW_DEAD:ROW_DEAD + 1],
                    jnp.where(died, F32(1.0), F32(0.0))),
        st[ROW_DEAD + 1:STATE_ROWS],
    ], axis=0)


def _kernel(flags_ref, seed_ref, st_ref, rows_ref, shd_ref, out_ref,
            *, fixed_rng: bool, weight_cutoff: float, has_shadow: bool):
    pid = pl.program_id(0)
    row = jax.lax.rem(pid, 8)
    live = flags_ref[row, 0] != 0

    @pl.when(jnp.logical_not(live))
    def _skip():
        out_ref[:] = st_ref[:]

    @pl.when(live)
    def _busy():
        st = st_ref[:]                                   # [16, RB]
        rows = rows_ref[:]                               # [16, RB]
        rb = st.shape[1]
        rv0, rv1, rv2 = scatter_rv(seed_ref[0, 0], seed_ref[0, 1], pid, rb,
                                   fixed_rng)
        shd = shd_ref[0:1, :] if has_shadow else None
        out_ref[:] = _shade_state_rows(st, rows, rv0, rv1, rv2, shd,
                                       weight_cutoff)


@functools.partial(jax.jit, static_argnames=("rb", "fixed_rng",
                                             "weight_cutoff", "interpret"))
def shade_pallas(state, rows, seed, rb: int, fixed_rng: bool,
                 weight_cutoff: float, chunk_live=None, shadowed=None,
                 interpret: bool = False):
    """One wave's shade + scatter + state update.

    state: [16, R] (ops.compact layout); rows: [16, R] trace winner rows;
    seed: [2] int32 (key-derived, folded with the wave by the caller);
    chunk_live: optional [NC] int32 skip flags (None = all chunks live);
    shadowed: optional [1, R] f32/bool shadow mask (lights configs).
    Returns the updated state [16, R].
    """
    R = state.shape[1]
    NC = R // rb
    if chunk_live is None:
        chunk_live = jnp.ones((NC,), jnp.int32)
    NC8 = -(-NC // 8) * 8
    flags = jnp.zeros((NC8, 128), jnp.int32).at[:NC, 0].set(
        chunk_live.astype(jnp.int32))
    seed2 = jnp.zeros((1, 2), jnp.int32).at[0].set(seed.astype(jnp.int32))

    has_shadow = shadowed is not None
    shd = shadowed.astype(F32) if has_shadow else state[0:1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(NC,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((STATE_ROWS, rb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TRACE_ROWS, rb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((STATE_ROWS, rb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_kernel, fixed_rng=fixed_rng,
                          weight_cutoff=weight_cutoff,
                          has_shadow=has_shadow),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((STATE_ROWS, R), F32)],
        interpret=interpret,
    )(flags, seed2, state, rows, shd)[0]
    return out
