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


def _kernel(flags_ref, o_ref, d_ref, v_ref, lo_ref, hi_ref,
            mask_ref, tmin_ref):
    """One chunk vs all pages.  lo/hi: [NPpad, 128] VMEM (lanes 0..2 = xyz).
    Outputs are [8, NPpad] blocks shared by 8 consecutive chunks (Mosaic
    requires sublane-dim-8 blocks); this chunk writes row i % 8."""
    row = jax.lax.rem(pl.program_id(0), 8)

    @pl.when(flags_ref[row, 0] == 0)
    def _dead():
        mask_ref[row, :] = jnp.zeros((mask_ref.shape[1],), F32)
        tmin_ref[row, :] = jnp.full((tmin_ref.shape[1],), jnp.inf, F32)

    @pl.when(flags_ref[row, 0] != 0)
    def _live():
        valid = v_ref[0:1, :] != 0.0                    # [1, RB]
        tlo = None
        thi = None
        for k in range(3):
            o_k = o_ref[k:k + 1, :]                     # [1, RB]
            d_k = d_ref[k:k + 1, :]
            inv = jnp.where(d_k != 0.0, 1.0 / d_k,
                            jnp.where(d_k >= 0.0, F32(BIG), F32(-BIG)))
            lo_k = lo_ref[:, k:k + 1]                   # [NPpad, 1]
            hi_k = hi_ref[:, k:k + 1]
            t1 = (lo_k - o_k) * inv                     # [NPpad, RB]
            t2 = (hi_k - o_k) * inv
            alo = jnp.minimum(t1, t2)
            ahi = jnp.maximum(t1, t2)
            tlo = alo if tlo is None else jnp.maximum(tlo, alo)
            thi = ahi if thi is None else jnp.minimum(thi, ahi)

        hit = (tlo <= thi) & (thi >= 0.0) & valid       # [NPpad, RB]
        entry = jnp.where(hit, jnp.maximum(tlo, 0.0), jnp.inf)
        mask_ref[row, :] = jnp.max(hit.astype(F32), axis=1)
        tmin_ref[row, :] = jnp.min(entry, axis=1)


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
        ],
        out_specs=[
            pl.BlockSpec((8, NPpad), lambda i: (i // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, NPpad), lambda i: (i // 8, 0),
                         memory_space=pltpu.VMEM),
        ],
    )

    mask_f, tmin = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((NC8, NPpad), F32),
            jax.ShapeDtypeStruct((NC8, NPpad), F32),
        ],
        interpret=interpret,
    )(flags, ot.astype(F32), dt.astype(F32), vrow, lo, hi)

    mask = mask_f[:NC, :NP] != 0.0
    return mask, jnp.where(mask, tmin[:NC, :NP], jnp.inf)
