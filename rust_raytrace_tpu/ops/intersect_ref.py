"""Numpy model of the intersect kernel contract — the kernel's test oracle.

Plays the role of the reference's `exec_rust_raytrace`
(cuda_raytrace_lib/src/cuda_raytrace.rs:118-229): a slow, pure-host
implementation with EXACTLY the kernel's input/output contract, run in tests
(and optionally alongside the device kernel) to diff results per ray.  The
formulas mirror ops/pages.py exactly — same operand order, same prescaled
sides — so kernel-vs-model comparisons are tight; semantic comparisons against
the geometric definition live in oracle.intersect_all.

Contract (shared by intersect_xla and intersect_pallas):
  inputs:  O, D            [R, 3] f32 ray origins / unit directions
           pages           PageTables
  outputs: best_t  [R] f32 — +inf where no hit
           best_id [R] int32 — triangle id, 0 = miss (sentinel convention of
                                cuda_rt.cu:317)
Tie-break: strictly-smaller t wins across pages (earlier page kept on equal t);
within a page, the smallest id among equal-t hits.
"""

import numpy as np

from .pages import PageTables

F32 = np.float32


def nearest_hit_model(O: np.ndarray, D: np.ndarray, pages: PageTables):
    O = np.asarray(O, dtype=F32)
    D = np.asarray(D, dtype=F32)
    R = O.shape[0]
    P = pages.page_size

    best_t = np.full(R, np.inf, dtype=F32)
    best_id = np.zeros(R, dtype=np.int32)

    for p in range(pages.num_pages):
        g = pages.G[p]          # [5P, 3]
        aux = pages.AUXT[p]     # [P, 8]

        MO = (g @ O.T).astype(F32)   # [5P, R]
        MD = (g @ D.T).astype(F32)

        mo_n, mo_s0, mo_s1, mo_s2 = (MO[i * P:(i + 1) * P] for i in range(4))
        md_n, md_s0, md_s1, md_s2 = (MD[i * P:(i + 1) * P] for i in range(4))

        with np.errstate(divide="ignore", invalid="ignore"):
            t = (aux[:, 0:1] - mo_n) / md_n                      # [P, R]
            d0 = mo_s0 + t * md_s0 - aux[:, 1:2]
            d1 = mo_s1 + t * md_s1 - aux[:, 2:3]
            d2 = mo_s2 + t * md_s2 - aux[:, 3:4]

        valid = (t >= 0) & (d0 <= 1) & (d1 <= 1) & (d2 <= 1)
        tt = np.where(valid, t, np.inf).astype(F32)

        page_min = tt.min(axis=0)                                 # [R]
        ids = np.where(tt == page_min[None, :], aux[:, 6:7],
                       np.inf).min(axis=0)                        # smallest id on ties
        upd = page_min < best_t
        best_t = np.where(upd, page_min, best_t)
        best_id = np.where(upd, ids.astype(np.int32), best_id)

    return best_t, best_id
