"""Pallas TPU nearest-hit kernel — the hot loop of the renderer.

TPU-native redesign of the reference CUDA kernel `cuda_triangle_intersect`
(cuda_raytrace_lib/src/cuda_rt.cu:145-324).  The CUDA kernel maps 1 block = 1
ray and 1 thread = 1 candidate triangle with a shared-memory log2 min-tree; on
TPU a grid cell is a (ray chunk x triangle page) TILE: plane-hit and half-plane
terms are rank-1 broadcast FMAs on the 8x128 VPU over the whole [P, RB] tile,
and the min-reduction folds first along sublanes (within the page) then across
pages into a running best that lives in the output block (revisited across the
inner grid dimension).

Why no MXU: the contractions here are K=3 (xyz), and fp32 HIGHEST-precision
matmul on the MXU pads K to a full systolic pass x multiple bf16 passes —
measured ~15x slower than the VPU broadcast form for this shape.

Why no bounding-circle test: the reference CPU path's `ip.len2() > bounding_r2`
reject (raytrace.rs:410) is an early-out only — every true hit lies inside the
triangle's corner-circumscribing circle, so the three half-plane tests alone
decide correctly (the reference's own CUDA kernel omits the circle test too,
cuda_rt.cu:166-256, and its Rust oracle neutralizes it with r2=1000 at
cuda_raytrace.rs:145).  Degenerate cases: t=+inf (ray parallel to plane) is
rejected because the weighted inward normals of a triangle sum to zero, so at
least one dist_k -> +inf; t=NaN fails `t >= 0`.

Unlike the reference host path, which re-marshals and re-uploads every cycle's
triangle pages (its measured bottleneck — cuda_rt.cu:341-398 vs the 4-phase
timers at :432-440), all pages stay resident in HBM and BlockSpecs stream them
through VMEM with automatic double buffering.

Layout (f32 VMEM tiling is (8,128)):
  rays as [3, R]      — xyz on sublanes (padded to 8), rays on lanes;
  G    as [5P, 3]     — attribute-major feature rows [norm|s0'|s1'|s2'|center],
                        each attribute a natural [P, 1]-sliceable block;
  AUXT as [P, 8]      — per-triangle scalars, sliced as [P, 1] columns that
                        broadcast along lanes;
  outputs as [NC*8, RB] — 8 sublane rows per ray chunk (row 0 is the result).

Miss sentinel: best_id 0 and best_t +inf (contract of cuda_rt.cu:313-323).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32

DEFAULT_RAY_CHUNK = 1024


def _kernel(o_ref, d_ref, g_ref, aux_ref, t_ref, id_ref, *, page_size: int):
    P = page_size
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        t_ref[:] = jnp.full_like(t_ref, jnp.inf)
        id_ref[:] = jnp.zeros_like(id_ref)

    g = g_ref[0]            # [5P, 3]
    aux = aux_ref[0]        # [P, 8]

    o0, o1, o2 = (o_ref[k:k + 1, :] for k in range(3))   # [1, RB] rows
    d0r, d1r, d2r = (d_ref[k:k + 1, :] for k in range(3))

    def matvec(a, r0, r1, r2):
        """g rows for attribute a (natural [P,1] slices) x ray rows -> [P, RB]."""
        blk = g[a * P:(a + 1) * P]
        return blk[:, 0:1] * r0 + blk[:, 1:2] * r1 + blk[:, 2:3] * r2

    mo_n = matvec(0, o0, o1, o2)
    md_n = matvec(0, d0r, d1r, d2r)
    t = (aux[:, 0:1] - mo_n) / md_n                         # [P, RB]

    d0 = matvec(1, o0, o1, o2) + t * matvec(1, d0r, d1r, d2r) - aux[:, 1:2]
    d1 = matvec(2, o0, o1, o2) + t * matvec(2, d0r, d1r, d2r) - aux[:, 2:3]
    d2 = matvec(3, o0, o1, o2) + t * matvec(3, d0r, d1r, d2r) - aux[:, 3:4]

    valid = (t >= 0.0) & (d0 <= 1.0) & (d1 <= 1.0) & (d2 <= 1.0)
    tt = jnp.where(valid, t, jnp.inf)

    page_min = jnp.min(tt, axis=0, keepdims=True)           # [1, RB]
    page_id = jnp.min(jnp.where(tt == page_min, aux[:, 6:7], jnp.inf),
                      axis=0, keepdims=True)                # smallest id on tie

    # Output blocks are [8, RB] (f32 sublane tiling); the running best lives
    # broadcast across all 8 sublane rows, row 0 is read back on the host.
    best_t = t_ref[:]
    upd = page_min < best_t
    t_ref[:] = jnp.where(upd, jnp.broadcast_to(page_min, best_t.shape), best_t)
    id_ref[:] = jnp.where(upd, jnp.broadcast_to(page_id, best_t.shape),
                          id_ref[:])


@functools.partial(jax.jit, static_argnames=("page_size", "ray_chunk",
                                             "interpret"))
def nearest_hit_pallas(O, D, G, AUXT, page_size: int,
                       ray_chunk: int = DEFAULT_RAY_CHUNK,
                       interpret: bool = False):
    """Kernel contract of ops/intersect_ref.py.

    O, D: [R, 3] f32 (R padded to a multiple of `ray_chunk` internally).
    Returns (best_t [R] f32 +inf-miss, best_id [R] int32 0-miss).
    """
    R = O.shape[0]
    NP = G.shape[0]
    RB = ray_chunk
    NC = -(-R // RB)
    Rpad = NC * RB

    OT = jnp.zeros((3, Rpad), F32).at[:, :R].set(O.T.astype(F32))
    # Padding rays get direction zero -> t = NaN or +-inf -> never valid.
    DT = jnp.zeros((3, Rpad), F32).at[:, :R].set(D.T.astype(F32))

    grid = (NC, NP)
    best_t, best_id = pl.pallas_call(
        functools.partial(_kernel, page_size=page_size),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, RB), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RB), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 5 * page_size, 3), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, page_size, 8), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, RB), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, RB), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NC * 8, RB), F32),
            jax.ShapeDtypeStruct((NC * 8, RB), F32),
        ],
        interpret=interpret,
    )(OT, DT, G, AUXT)

    best_t = best_t.reshape(NC, 8, RB)[:, 0, :].reshape(-1)[:R]
    best_id = best_id.reshape(NC, 8, RB)[:, 0, :].reshape(-1)[:R]
    return best_t, best_id.astype(jnp.int32)
