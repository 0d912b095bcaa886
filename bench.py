"""Benchmark: teapot_2k on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
Metric is million rays traced per second (the reference's primary metric,
printed by print_stats at raytrace_lib/src/progress.rs:157-162), on the
teapot_2k config (2560x1440, full scene, maxdepth 5, 1 spp — the active scene
of raytrace/src/main.rs:116-173 at its 2k preset).  Baseline: 50 Mrays/s
(driver BASELINE.json north star).
"""

import json
import time

import numpy as np

BASELINE_MRAYS = 50.0


def main():
    import jax

    from rust_raytrace_tpu.models import teapot
    from rust_raytrace_tpu.scene import reference_asset
    from rust_raytrace_tpu.utils import png

    scene, vp = teapot.build(resolution="2k")
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from rust_raytrace_tpu.engine import Engine

        backend = "engine"
        renderer = Engine(scene, page_size=256, ray_chunk=1024)
    else:
        from rust_raytrace_tpu.render import WavefrontRenderer

        backend = "xla"
        renderer = WavefrontRenderer(scene, backend=backend, page_size=256,
                                     ray_chunk=1024)

    # warmup (compilation)
    renderer.render(vp, key=jax.random.PRNGKey(0))

    times = []
    rays = 0
    result = None
    for i in range(3):
        t0 = time.perf_counter()
        result = renderer.render(vp, key=jax.random.PRNGKey(i))
        times.append(time.perf_counter() - t0)
        rays = result.rays_traced
    dt = min(times)
    mrays = rays / dt / 1e6

    extras = {
        "rays_traced": rays,
        "seconds": round(dt, 4),
        "resolution": "2560x1440",
        "backend": backend,
        "device": str(jax.devices()[0]),
    }

    golden = reference_asset("teapot_4k_tris.png")
    if golden is not None:
        # teapot_4k_tris.png is the golden render of the CURRENT main.rs scene
        # (the other PNGs predate it); compare at 4k when feasible, else skip.
        extras["golden_note"] = ("rmse vs teapot_4k_tris.png reported by "
                                 "tests/test_golden.py")

    print(json.dumps({
        "metric": "mrays_per_sec_teapot_2k",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
        **extras,
    }))


if __name__ == "__main__":
    main()
