"""Benchmark: teapot_2k on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
Metric is million rays traced per second (the reference's primary metric,
printed by print_stats at raytrace_lib/src/progress.rs:157-162), on the
teapot_2k config (2560x1440, full scene, maxdepth 5, 1 spp — the active scene
of raytrace/src/main.rs:116-173 at its 2k preset).  Baseline: 50 Mrays/s
(driver BASELINE.json north star).

`value` is end-to-end wall time per render including the device->host image
transfer; on this development platform the chip is reached through a network
tunnel (~35 MB/s), so `device_mrays_per_sec` additionally reports chip
throughput with the transfer excluded (an on-prem deployment's wall number).
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

    extras = {
        "resolution": "2560x1440",
        "device": str(jax.devices()[0]),
    }

    if on_tpu:
        import jax.numpy as jnp

        from rust_raytrace_tpu.engine import (Engine, _camera_rays_tiled,
                                              _render_device)

        extras["backend"] = "engine(pallas)"
        page_size, rb = 64, 1024
        eng = Engine(scene, page_size=page_size, ray_chunk=rb)
        eng.render(vp, key=jax.random.PRNGKey(0))     # warmup/compile

        times = []
        result = None
        for i in range(3):
            t0 = time.perf_counter()
            result = eng.render(vp, key=jax.random.PRNGKey(i))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        rays = result.rays_traced
        mrays = rays / dt / 1e6

        # device-only (transfer excluded): fetch 8 lanes to force completion
        key = jax.random.PRNGKey(0)
        R0 = vp.height * vp.width
        R = -(-R0 // rb) * rb
        o, d = _camera_rays_tiled(
            jnp.asarray(vp.orig), jnp.asarray(vp.cam), jnp.asarray(vp.vu),
            jnp.asarray(vp.vv), key, width=vp.width, height=vp.height,
            spp=1, tile=32, n_pad=R)
        alive = jnp.arange(R) < R0

        def dev_render(k):
            img, wc, _ = _render_device(
                eng.tensors, eng.aabb_lo, eng.aabb_hi, o, d, alive, k,
                maxdepth=vp.maxdepth, ray_chunk=rb, page_size=page_size,
                fixed_rng=False, interpret=False, want_primary=False,
                quantize=True, spp=1, weight_cutoff=1 / 512)
            return img, wc

        img, wc = dev_render(key)
        np.asarray(img[:, :8])
        dts = []
        for i in range(3):
            t0 = time.perf_counter()
            img, wc = dev_render(jax.random.PRNGKey(i))
            np.asarray(img[:, :8])
            dts.append(time.perf_counter() - t0)
        dev_rays = int(np.asarray(wc).sum())
        extras["device_mrays_per_sec"] = round(dev_rays / min(dts) / 1e6, 3)
        extras["device_seconds"] = round(min(dts), 4)
    else:
        from rust_raytrace_tpu.render import WavefrontRenderer

        extras["backend"] = "xla-cpu"
        r = WavefrontRenderer(scene, backend="xla", page_size=128,
                              ray_chunk=1024)
        r.render(vp, key=jax.random.PRNGKey(0))
        t0 = time.perf_counter()
        result = r.render(vp, key=jax.random.PRNGKey(1))
        dt = time.perf_counter() - t0
        rays = result.rays_traced
        mrays = rays / dt / 1e6

    extras["rays_traced"] = rays
    extras["seconds"] = round(dt, 4)

    golden = reference_asset("teapot_4k_tris.png")
    if golden is not None:
        extras["golden_note"] = ("teapot_4k_tris.png is the golden of the "
                                 "current main.rs scene; per-run RMSE vs "
                                 "committed deterministic goldens is enforced "
                                 "in tests/test_golden.py")

    print(json.dumps({
        "metric": "mrays_per_sec_teapot_2k",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
        **extras,
    }))


if __name__ == "__main__":
    main()
