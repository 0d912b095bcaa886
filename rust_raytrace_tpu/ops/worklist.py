"""Host-side worklist construction from cull masks.

The analog of the reference's cycle refill (`walk_rays_workqueue`,
cuda_raytrace.rs:344-366): turn the [NC, NP] chunk x page visibility mask into
a flat list of (chunk, page) work items for the ragged kernel.  Items are
chunk-major (np.nonzero row-major order) so consecutive items share ray and
output blocks; `init_flags` marks each chunk's first item.

Work counts are padded to power-of-two buckets so the ragged kernel compiles
for a handful of shapes per scene; padding replicates the last item, which is
harmless because the running-min update is idempotent.
"""

import numpy as np


def next_bucket(n: int, minimum: int = 512) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def build_worklist(mask: np.ndarray, bucket_min: int = 512):
    """mask: [NC, NP] bool (host).  Returns (chunk_ids, page_ids, init_flags)
    int32 arrays of bucketed length W.

    Every chunk gets at least one item (page 0) so its output block is
    initialized even when all pages were culled (all-miss chunk).
    """
    mask = np.asarray(mask)
    nc = mask.shape[0]
    empty = ~mask.any(axis=1)
    if empty.any():
        mask = mask.copy()
        mask[empty, 0] = True

    rows, cols = np.nonzero(mask)
    w = rows.shape[0]
    flags = np.empty(w, dtype=np.int32)
    flags[0] = 1
    flags[1:] = (rows[1:] != rows[:-1]).astype(np.int32)

    wb = next_bucket(w, bucket_min)
    chunk_ids = np.full(wb, rows[-1], dtype=np.int32)
    page_ids = np.full(wb, cols[-1], dtype=np.int32)
    init_flags = np.zeros(wb, dtype=np.int32)
    chunk_ids[:w] = rows
    page_ids[:w] = cols
    init_flags[:w] = flags
    return chunk_ids, page_ids, init_flags
