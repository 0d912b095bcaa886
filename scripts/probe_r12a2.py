"""Follow-up to probe_r12a: WHAT is in the golden's two big residual blobs?

probe_r12a found the silhouette residual is two coherent ~30k-px regions
(rows 0-703, cols 465-740 at 4K) where the golden has geometry and we render
sky.  This reads the golden's pixels there (color class: reflective disk
gray ~(230,230,230)-ish? teapot orange (252,119,0)? wireframe black? sky
tint?) and compares the geometry of the region against where OUR disks land,
without re-rendering (uses the golden + our 4K debug render cached by
probe_r12a if present, else renders).

Run: python scripts/probe_r12a2.py   (host-only if the npz cache exists)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_rt"))

import numpy as np

CACHE = "/tmp/probe_r12a_render.npz"


def get_render():
    if os.path.exists(CACHE):
        z = np.load(CACHE)
        return z["img"], z["pid"]
    import jax

    from rust_raytrace_tpu.engine import Engine
    from rust_raytrace_tpu.models import teapot

    scene, vp = teapot.build(resolution="4k")
    eng = Engine(scene)
    res = eng.render(vp, key=jax.random.PRNGKey(0), debug=True)
    np.savez_compressed(CACHE, img=res.image, pid=res.primary_id)
    return res.image, res.primary_id


def main():
    from scipy import ndimage

    from rust_raytrace_tpu.scene import reference_asset
    from rust_raytrace_tpu.utils.parity import (GOLDEN_SKY, OUR_SKY,
                                                sky_mask)
    from rust_raytrace_tpu.utils.png import read_png, write_png

    golden = read_png(reference_asset("teapot_4k_tris.png"))
    img, pid = get_render()
    gsky = sky_mask(golden.astype(np.float32), GOLDEN_SKY)
    osky = sky_mask(img.astype(np.float32), OUR_SKY)
    golden_only = ~gsky & osky

    lab, n = ndimage.label(golden_only)
    sizes = np.bincount(lab.ravel())[1:]
    order = np.argsort(sizes)[::-1]
    for rank in range(min(3, n)):
        li = order[rank] + 1
        m = lab == li
        ys, xs = np.nonzero(m)
        r0, r1, c0, c1 = ys.min(), ys.max(), xs.min(), xs.max()
        px = golden[m].astype(np.float32)
        print(f"blob{rank}: {m.sum()} px bbox rows {r0}-{r1} cols {c0}-{c1} "
              f"center ({(r0 + r1) // 2},{(c0 + c1) // 2})", flush=True)
        print(f"  golden color mean {px.mean(axis=0).round(1)} "
              f"median {np.median(px, axis=0).round(1)} "
              f"p10 {np.percentile(px, 10, axis=0).round(1)} "
              f"p90 {np.percentile(px, 90, axis=0).round(1)}")
        # crop for visual inspection
        rr0, rr1 = max(0, r0 - 40), min(golden.shape[0], r1 + 40)
        cc0, cc1 = max(0, c0 - 40), min(golden.shape[1], c1 + 40)
        write_png(f"/tmp/blob{rank}_golden.png", golden[rr0:rr1, cc0:cc1])
        write_png(f"/tmp/blob{rank}_ours.png", img[rr0:rr1, cc0:cc1])

    # where do OUR objects land (bboxes from the primary-id buffer)?
    for nm, lo, hi in (("teapot", 1, 6320), ("disk1", 6321, 6520),
                       ("disk2", 6521, 6720)):
        m = (pid >= lo) & (pid <= hi)
        if not m.any():
            print(f"{nm}: not visible")
            continue
        ys, xs = np.nonzero(m)
        print(f"{nm}: {m.sum()} px bbox rows {ys.min()}-{ys.max()} "
              f"cols {xs.min()}-{xs.max()}")

    # and the golden's full non-sky bbox vs ours
    for nm, m in (("golden_sil", ~gsky), ("ours_sil", ~osky)):
        ys, xs = np.nonzero(m)
        print(f"{nm}: bbox rows {ys.min()}-{ys.max()} cols "
              f"{xs.min()}-{xs.max()}")


if __name__ == "__main__":
    main()
