"""Round-11 randomized soak: fresh disjoint seeds through the surfaces the
round-10 session added plus two never-randomized production probes:

  - rsharded: the USER-FACING multi-chip API — Engine.render_sharded(vp)
             on a random scene over a random mesh size (2/4/8 virtual CPU
             devices), random spp in {1,2,4}, random lights on/off, random
             quantize — must equal Engine.render(vp) BITWISE (image, wave
             counts, rays_traced).  Unlike the r10 `sharded` leg this
             drives the full user path: camera tiling, shard quantum
             padding, pinhole page fold, host un-permute.
  - walkone: the single-pixel production probe (Engine.walk_one_ray,
             raytrace.rs:1442-1455) at 3 random pixels of a random scene
             == the full render's pixel (float bitwise) and primary hit id
             == the debug buffer's.
  - reflect: deep specular chains — all-reflective random scenes at
             maxdepth in {5,6} with low scattering keep rays alive many
             waves; full differential contract (engine == xla bitwise,
             both <= 1 ULP of the recursive oracle).

Earlier soaks used seeds 101-260 (r6), 500-559 (r8), 700-744 (r10);
seeds here are 800-859 (60 scenes), disjoint.

Run (CPU-only): python scripts/soak_r11.py > /tmp/soak_r11.log 2>&1
"""
import os
import sys
import traceback

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
os.environ.setdefault("JAX_NUM_CPU_DEVICES", "8")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_default_device", jax.local_devices(backend="cpu")[0])

import numpy as np

import test_fuzz as TF

F32 = np.float32


def rsharded(rng, seed):
    from rust_raytrace_tpu import math3d as m3
    from rust_raytrace_tpu.camera import create_viewport
    from rust_raytrace_tpu.engine import Engine
    from rust_raytrace_tpu.parallel.sharding import make_mesh
    from rust_raytrace_tpu.scene import LightSource

    scene = TF._rand_scene(rng, n_soup=int(rng.integers(2, 4)),
                           disks=[int(rng.integers(3, 8))] if seed % 2 else [])
    with_light = bool(rng.integers(0, 2))
    if with_light:
        scene.lights = LightSource(
            orig=(rng.uniform(-2, 2, 3) + np.asarray([0, 6, 8])).astype(F32),
            len2=float(rng.uniform(0.05, 0.5)))
    spp = int(rng.choice([1, 2, 4]))
    quantize = bool(rng.integers(0, 2))
    n_dev = int(rng.choice([2, 4, 8]))
    px = (24, 16)
    pos = rng.uniform(-0.4, 0.4, 3).astype(F32)
    aim = m3.unit(np.asarray(
        [rng.uniform(-0.25, 0.25), rng.uniform(-0.25, 0.25), 1.0], dtype=F32))
    vp = create_viewport(px, (1.5, 1.5 * px[1] / px[0]), pos, aim,
                         float(rng.uniform(60.0, 100.0)),
                         float(rng.uniform(-0.3, 0.3)),
                         int(rng.integers(3, 5)), spp)
    eng = Engine(scene, page_size=int(rng.choice([16, 24, 40])),
                 ray_chunk=128, interpret=True, auto_pages=False)
    r1 = eng.render(vp, fixed_rng=True, quantize=quantize)
    rn = eng.render_sharded(vp, mesh=make_mesh(n_dev), fixed_rng=True,
                            quantize=quantize)
    np.testing.assert_array_equal(rn.image, r1.image)
    np.testing.assert_array_equal(rn.wave_rays, r1.wave_rays)
    assert rn.rays_traced == r1.rays_traced
    return (f"rsharded tris={len(scene.tris)} n={n_dev} spp={spp} "
            f"light={int(with_light)} quant={int(quantize)}")


def walkone(rng, seed):
    from rust_raytrace_tpu.engine import Engine

    scene = TF._rand_scene(rng, n_soup=int(rng.integers(2, 5)),
                           spheres=[(6, 8)] if seed % 2 else [])
    vp = TF._rand_viewport(rng, (32, 24), maxdepth=int(rng.integers(3, 6)))
    eng = Engine(scene, page_size=int(rng.choice([16, 24])), ray_chunk=128,
                 interpret=True, auto_pages=False)
    full = eng.render(vp, fixed_rng=True, debug=True, quantize=False)
    pxs = []
    for _ in range(3):
        px = (int(rng.integers(0, vp.height)), int(rng.integers(0, vp.width)))
        res = eng.walk_one_ray(vp, px)
        np.testing.assert_array_equal(res.image[0, 0], full.image[px])
        assert res.primary_id[0, 0] == full.primary_id[px], (px,)
        pxs.append(px)
    return f"walkone tris={len(scene.tris)} pxs={pxs}"


def reflect(rng, seed):
    from rust_raytrace_tpu import math3d as m3
    from rust_raytrace_tpu.geometry import make_sphere
    from rust_raytrace_tpu.materials import reflective
    from rust_raytrace_tpu.scene import assemble

    # all-reflective: long specular chains exercise deep waves + the
    # count-sorted per-lane bounce path at every depth
    parts = []
    for _ in range(int(rng.integers(2, 4))):
        surf = reflective(
            m3.make_color(tuple(int(c) for c in rng.integers(120, 255, 3))),
            float(rng.uniform(0.5, 0.9)), float(rng.uniform(0.0, 0.1)))
        orig = rng.uniform(-2, 2, 3).astype(F32) + np.asarray(
            [0, 0, 8], dtype=F32)
        parts.append(make_sphere(tuple(orig), float(rng.uniform(0.8, 1.8)),
                                 (6, 8), surf, float(rng.uniform(0.0, 0.05))))
    parts.append(TF._soup(rng, int(rng.integers(6, 16)), (0.0, 0.0, 8.0),
                          1.2))
    scene = assemble(parts)
    vp = TF._rand_viewport(rng, (32, 24), maxdepth=int(rng.integers(5, 7)))
    TF._assert_contract(scene, vp, page_size=int(rng.choice([16, 24])),
                        ray_chunk=128)
    return f"reflect tris={len(scene.tris)} depth={vp.maxdepth}"


def main():
    ok = bad = 0
    for seed in range(800, 860):
        if seed % 8 == 0:
            # interpret-mode executables exhaust vm.max_map_count after
            # ~42 compiles (measured, soak_r8) — drop them periodically
            jax.clear_caches()
        rng = np.random.default_rng(seed)
        kind = (rsharded, walkone, reflect)[seed % 3]
        try:
            info = kind(rng, seed)
            ok += 1
            print(f"seed {seed}: OK ({info})", flush=True)
        except Exception:
            bad += 1
            print(f"seed {seed}: FAILED\n{traceback.format_exc()[-1500:]}",
                  flush=True)
    print(f"soak done: {ok} ok, {bad} failed", flush=True)


if __name__ == "__main__":
    main()
