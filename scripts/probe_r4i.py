"""Round-4 probe I: the 1-spp RMSE noise floor, measured on our own engine.

BASELINE.json asks for "image RMSE < 1e-3 vs the CPU reference render".
PARITY.md argues that is unattainable for ANY 1-spp re-render because the
bounce RNG makes stochastic pixels i.i.d. — this probe PINS the number:
render the same teapot_4k config twice with independent RNG keys and
compute the RMSE between the two (plus each against the shipped golden).
If self-RMSE ~= golden-RMSE, the measured parity gap IS the noise floor.

Run: nohup python scripts/probe_r4i.py > /tmp/probe_r4i.log 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_rt"))

import numpy as np


def main():
    import jax

    from rust_raytrace_tpu.engine import Engine
    from rust_raytrace_tpu.models import teapot
    from rust_raytrace_tpu.scene import reference_asset
    from rust_raytrace_tpu.utils.parity import parity_stats
    from rust_raytrace_tpu.utils.png import quantize_u8, read_png

    print("device:", jax.devices()[0], flush=True)
    scene, vp = teapot.build(resolution="4k")
    eng = Engine(scene)

    imgs = []
    for k in (11, 22):
        res = eng.render(vp, key=jax.random.PRNGKey(k))
        img = res.image
        if img.dtype != np.uint8:
            img = quantize_u8(img)
        imgs.append(np.asarray(img))
        print(f"render key={k} done", flush=True)

    a, b = (x.astype(np.float64) / 255.0 for x in imgs)
    d = a - b
    rmse = float(np.sqrt((d ** 2).mean()))
    mae = float(np.abs(d).mean())
    frac = float((np.abs(d).max(axis=-1) > 1 / 255).mean())
    print(f"self (key11 vs key22): RMSE {rmse:.4f} MAE {mae:.4f} "
          f"frac_pixels_diff {frac:.4f}", flush=True)

    golden = reference_asset("teapot_4k_tris.png")
    if golden:
        g = read_png(golden)
        for k, img in zip((11, 22), imgs):
            s = parity_stats(img, g)
            print(f"key{k} vs shipped golden: "
                  f"{ {kk: round(v, 4) for kk, v in s.items()} }", flush=True)


if __name__ == "__main__":
    main()
