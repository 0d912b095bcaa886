"""Pixel-level forensics on the golden silhouette residual (VERDICT r3 #7).

The parity gate measures silhouette IoU ~0.977 vs the reference's shipped
teapot_4k_tris.png and attributes the residual 2.3% to "goldens predate the
shipped source" by sky-constant forensics alone.  This probe classifies the
disagreeing silhouette pixels AT FULL 4K on the real chip, using the
engine's debug surface (primary_id) to attribute each pixel to an object:

  - direction: ours-only (we render geometry where the golden has sky) vs
    golden-only (the golden has geometry where we render sky);
  - edge-band: distance (in px) from the disagreeing pixel to the NEAREST
    agreeing silhouette boundary — a 1-2 px band is downsample/aliasing +
    1-spp noise at edges; a thick coherent region is a transform delta;
  - object: teapot (tri ids 1..6320), disk1 (6321..6520), disk2
    (6521..6720) from the primary-id buffer for ours-only pixels; nearest
    our-object for golden-only pixels;
  - largest connected component of the residual (a real shifted/missing
    object shows up as ONE big blob, aliasing as thousands of tiny ones).

Run: nohup python scripts/probe_r12a.py > /tmp/probe_r12a.log 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_rt"))

import numpy as np


def classify(ours_img, primary_id, golden, name, out):
    from scipy import ndimage

    from rust_raytrace_tpu.utils.parity import (GOLDEN_SKY, OUR_SKY,
                                                sky_mask)

    gsky = sky_mask(golden.astype(np.float32), GOLDEN_SKY)
    osky = sky_mask(ours_img.astype(np.float32), OUR_SKY)
    g_sil = ~gsky
    o_sil = ~osky
    inter = (g_sil & o_sil).sum()
    union = (g_sil | o_sil).sum()
    print(f"[{name}] IoU {inter / union:.5f}  golden_sil {g_sil.sum()}  "
          f"ours_sil {o_sil.sum()}", flush=True)

    resid = g_sil ^ o_sil
    ours_only = o_sil & ~g_sil
    golden_only = g_sil & ~o_sil
    print(f"[{name}] residual {resid.sum()} px "
          f"({resid.mean() * 100:.3f}% of image; "
          f"{resid.sum() / union * 100:.2f}% of silhouette union)  "
          f"ours_only {ours_only.sum()}  golden_only {golden_only.sum()}",
          flush=True)

    # --- edge-band: distance from each residual pixel to the nearest
    # AGREED silhouette boundary (the edge of the intersection region)
    agreed = g_sil & o_sil
    edge = agreed ^ ndimage.binary_erosion(agreed)
    dist = ndimage.distance_transform_edt(~edge)
    for m, label in ((ours_only, "ours_only"), (golden_only, "golden_only")):
        if not m.any():
            continue
        dd = dist[m]
        hist = [(dd <= k).mean() * 100 for k in (1, 2, 3, 5, 10)]
        print(f"[{name}] {label}: dist-to-agreed-edge px "
              f"<=1:{hist[0]:.1f}% <=2:{hist[1]:.1f}% <=3:{hist[2]:.1f}% "
              f"<=5:{hist[3]:.1f}% <=10:{hist[4]:.1f}%  max {dd.max():.0f}",
              flush=True)

    # --- object attribution from the primary-id buffer
    if primary_id is not None:
        pid = primary_id
        ranges = [("teapot", 1, 6320), ("disk1", 6321, 6520),
                  ("disk2", 6521, 6720)]
        for m, label in ((ours_only, "ours_only"),
                         (golden_only, "golden_only")):
            if not m.any():
                continue
            if label == "ours_only":
                ids = pid[m]
                parts = {nm: int(((ids >= lo) & (ids <= hi)).sum())
                         for nm, lo, hi in ranges}
                parts["miss?!"] = int((ids == 0).sum())
            else:
                # golden-only pixels miss in OUR render; attribute to the
                # nearest our-object pixel
                idx = ndimage.distance_transform_edt(
                    pid == 0, return_distances=False, return_indices=True)
                near = pid[idx[0][m], idx[1][m]]
                parts = {nm: int(((near >= lo) & (near <= hi)).sum())
                         for nm, lo, hi in ranges}
            total = m.sum()
            frac = {k: f"{v} ({v / total * 100:.1f}%)"
                    for k, v in parts.items()}
            print(f"[{name}] {label} by object: {frac}", flush=True)

    # --- connected components of the residual
    lab, n = ndimage.label(resid)
    if n:
        sizes = np.sort(np.bincount(lab.ravel())[1:])[::-1]
        print(f"[{name}] residual components: {n}  sizes top5 "
              f"{sizes[:5].tolist()}  median {int(np.median(sizes))}",
              flush=True)
        # where is the biggest blob?
        big = np.argwhere(lab == (np.bincount(lab.ravel())[1:].argmax() + 1))
        r0, c0 = big.min(axis=0)
        r1, c1 = big.max(axis=0)
        print(f"[{name}] largest blob bbox rows {r0}-{r1} cols {c0}-{c1}",
              flush=True)
    out[name] = dict(iou=float(inter / union), resid=int(resid.sum()))


def main():
    import jax

    from rust_raytrace_tpu.engine import Engine
    from rust_raytrace_tpu.models import teapot
    from rust_raytrace_tpu.scene import reference_asset
    from rust_raytrace_tpu.utils.parity import downsample_u8
    from rust_raytrace_tpu.utils.png import read_png

    print("device:", jax.devices()[0], flush=True)
    golden = read_png(reference_asset("teapot_4k_tris.png"))  # 3840x2160 u8
    scene, vp = teapot.build(resolution="4k")
    eng = Engine(scene)
    res = eng.render(vp, key=jax.random.PRNGKey(0), debug=True)
    print("rendered", res.image.shape, res.seconds, flush=True)

    out = {}
    classify(res.image, res.primary_id, golden, "full4k", out)

    # the bench's view: both downsampled to 1280x720 (golden /3, ours
    # /3 here since we rendered 4k) — how much of the residual is the
    # downsample itself?
    g_small = downsample_u8(golden, 3)
    o_small = downsample_u8(res.image, 3)
    pid_small = res.primary_id[::3, ::3][:720, :1280] \
        if res.primary_id is not None else None
    classify(o_small, pid_small, g_small, "down720", out)
    print("RESULT", out, flush=True)


if __name__ == "__main__":
    main()
