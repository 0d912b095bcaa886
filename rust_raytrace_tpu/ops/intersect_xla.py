"""Pure-XLA nearest-hit: lax.scan over triangle pages with a running min.

The portable implementation of the kernel contract (see intersect_ref.py) —
used as the CPU/interpret fallback and as a second differential implementation
against the Pallas kernel.  Structure mirrors the reference GPU cycle loop
(`cuda_raytrace.rs:340-504`): fixed-shape page per step, running best-hit
carried between steps — but expressed as a scan XLA can pipeline, with the
scene resident on device.
"""

import jax
import jax.numpy as jnp

from .pages import PageTables

F32 = jnp.float32


def device_pages(pages: PageTables):
    """Move page tables to device arrays (done once per scene)."""
    return jnp.asarray(pages.G), jnp.asarray(pages.AUXT)


def nearest_hit_xla(O, D, G, AUXT, page_size: int):
    """O, D: [R, 3] f32.  G: [NP, 3, 5P], AUXT: [NP, P, 8].

    Returns (best_t [R] f32 with +inf misses, best_id [R] int32, 0 = miss).
    """
    P = page_size
    OT = O.T.astype(F32)   # [3, R]
    DT = D.T.astype(F32)

    # Derive the scan init from the inputs (not fresh zeros) so it inherits
    # their sharding/varying axes under shard_map.
    init = (jnp.full_like(O[:, 0], jnp.inf), jnp.zeros_like(O[:, 0]))

    def step(carry, page):
        best_t, best_id = carry
        g, aux = page                      # [5P, 3], [P, 8]

        # Precision.HIGHEST: TPU default matmul precision is bf16-grade, which
        # flips hit predicates near triangle edges; geometry needs true f32.
        MO = jax.lax.dot_general(g, OT, (((1,), (0,)), ((), ())),
                                 precision=jax.lax.Precision.HIGHEST,
                                 preferred_element_type=F32)   # [5P, R]
        MD = jax.lax.dot_general(g, DT, (((1,), (0,)), ((), ())),
                                 precision=jax.lax.Precision.HIGHEST,
                                 preferred_element_type=F32)

        mo_n, mo_s0, mo_s1, mo_s2 = (MO[i * P:(i + 1) * P] for i in range(4))
        md_n, md_s0, md_s1, md_s2 = (MD[i * P:(i + 1) * P] for i in range(4))

        t = (aux[:, 0:1] - mo_n) / md_n
        d0 = mo_s0 + t * md_s0 - aux[:, 1:2]
        d1 = mo_s1 + t * md_s1 - aux[:, 2:3]
        d2 = mo_s2 + t * md_s2 - aux[:, 3:4]

        valid = (t >= 0) & (d0 <= 1) & (d1 <= 1) & (d2 <= 1)
        tt = jnp.where(valid, t, jnp.inf)

        page_min = tt.min(axis=0)                                   # [R]
        ids = jnp.where(tt == page_min[None, :], aux[:, 6:7],
                        jnp.inf).min(axis=0)
        upd = page_min < best_t
        return (jnp.where(upd, page_min, best_t),
                jnp.where(upd, ids, best_id)), None

    (best_t, best_id), _ = jax.lax.scan(step, init, (G, AUXT))
    return best_t, best_id.astype(jnp.int32)
