"""Triangle page tables — the kernel-side scene layout.

The reference GPU path marshals, per cycle, per-ray lists of <=256 candidate
triangles into a thread-strided SoA layout (`cuda_rt.cu:32-56, 341-377`) and
re-uploads them every cycle; its host-side pagination windows each ray's
ordered leaf list into fixed-size pages (`cuda_raytrace.rs:231-253`).

On TPU the scene lives in HBM once, pre-packed into fixed-size PAGES of
triangle FEATURES shaped for the intersect kernel, and pages are streamed
through VMEM by BlockSpecs — no per-cycle repacking (that repack is the
reference's measured bottleneck; see its 4-phase timers, cuda_rt.cu:432-440).

Per page of P triangles:
  G    [5P, 3] f32 — feature rows, attribute-major blocks of P rows each:
        [ norm | s0' | s1' | s2' | center ], where s'_k = sides_k/side_lens_k
        (prescaled so the half-plane test becomes dot(ip, s'_k) <= 1; valid
        since the centroid is strictly inside, so side_lens > 0).  Row-major
        [5P, 3] keeps each attribute a natural [P, 1]-sliceable column block
        in VMEM (no relayouts in the kernel).
  AUXT [P, 8] f32 — per-triangle scalars
        [ n.c, s0'.c, s1'.c, s2'.c, c.c, bounding_r2, id, 0 ]
        (id stored as f32 — exact for ids < 2^24; c.c and r2 retained for
        diagnostics, unused by the hit predicate).

Intersection math consumed by all kernel implementations (see
ops/intersect_ref.py for the executable model):
  MO = G O, MD = G D for ray origins O [3,R] and unit directions D [3,R]
  t      = (n.c - MO_n) / MD_n
  dist_k = MO_sk + t * MD_sk - s'_k.c            (<= 1 for inside)
  valid  = t >= 0  AND  all dist_k <= 1
with the same accept-on-equality boundaries as `Triangle::intersects`
(raytrace.rs:400-439).  The reference CPU path's bounding-circle reject
(raytrace.rs:410) is an early-out, not a semantic filter — every true hit lies
inside the corner circle — so the kernel contract omits it, exactly as the
reference's own CUDA kernel does (cuda_rt.cu:166-256; its Rust oracle
neutralizes the circle with r2=1000, cuda_raytrace.rs:145).

Sentinel id 0 = miss; padding rows are all-zero (norm = 0 -> t = NaN -> never
valid) with id 0.
"""

from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

from ..geometry import TriangleArrays

F32 = np.float32


@dataclass
class PageTables:
    """Paged scene tables (numpy host-side; moved to device by the renderer)."""

    G: np.ndarray      # [NP, 5P, 3] f32
    AUXT: np.ndarray   # [NP, P, 8] f32
    page_size: int
    num_tris: int      # real (unpadded) triangle count referenced by the pages

    @property
    def num_pages(self) -> int:
        return self.G.shape[0]


def pack_features(tris: TriangleArrays, indices: np.ndarray):
    """Feature rows for a flat list of triangle indices -> (feat [n,3,5], aux [n,8])."""
    n = indices.shape[0]
    sel = indices.astype(np.int64)
    center = tris.incenter[sel]                      # [n,3]
    norm = tris.norm[sel]                            # [n,3]
    s = tris.sides[sel] / tris.side_lens[sel][..., None]   # [n,3,3] prescaled
    r2 = tris.bounding_r2[sel]

    feat = np.stack([norm, s[:, 0], s[:, 1], s[:, 2], center], axis=1)  # [n,5,3]
    aux = np.empty((n, 8), dtype=F32)
    aux[:, 0] = np.einsum("nc,nc->n", norm, center)
    aux[:, 1] = np.einsum("nc,nc->n", s[:, 0], center)
    aux[:, 2] = np.einsum("nc,nc->n", s[:, 1], center)
    aux[:, 3] = np.einsum("nc,nc->n", s[:, 2], center)
    aux[:, 4] = np.einsum("nc,nc->n", center, center)
    aux[:, 5] = r2
    aux[:, 6] = sel.astype(F32)
    aux[:, 7] = 0.0
    return feat.astype(F32), aux


def build_pages(tris: TriangleArrays, page_size: int = 128,
                order: Optional[Sequence[int]] = None) -> PageTables:
    """Pack triangles into fixed-size pages.

    `order`: triangle indices to include, in page order.  Defaults to the
    brute-force list 1..N-1 (slot 0, the miss sentinel, is excluded exactly as
    `build_bounding_box` excludes it — raytrace.rs:791).  Octree-ordered page
    lists pass leaf-grouped indices here.
    """
    if order is None:
        order = np.arange(1, len(tris), dtype=np.int64)
    order = np.asarray(order, dtype=np.int64)

    n = order.shape[0]
    num_pages = max(1, -(-n // page_size))
    padded = num_pages * page_size

    feat, aux = pack_features(tris, order)

    feat_p = np.zeros((padded, 5, 3), dtype=F32)
    aux_p = np.zeros((padded, 8), dtype=F32)
    aux_p[:, 5] = -1.0  # padding marker (diagnostics only)
    feat_p[:n] = feat
    aux_p[:n] = aux

    # [NP, P, 5, 3] -> G [NP, 5P, 3] attribute-major: row [a*P + p] holds
    # attribute a of page-local triangle p.
    g = feat_p.reshape(num_pages, page_size, 5, 3)
    g = np.transpose(g, (0, 2, 1, 3)).reshape(num_pages, 5 * page_size, 3)

    return PageTables(
        G=np.ascontiguousarray(g),
        AUXT=np.ascontiguousarray(aux_p.reshape(num_pages, page_size, 8)),
        page_size=page_size,
        num_tris=len(tris),
    )
