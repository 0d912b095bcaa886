"""Round-8 randomized-differential soak: 60 fresh seeds through the
test_fuzz contracts, now ALSO drawing random LIGHTS scenes (fused
per-lane feeler == unfused chain bitwise, near-oracle up to flipped
shadow-boundary pixels) and random MULTI-BANK scenes (P=8 forcing >=2
banks) alongside the plain engine==xla==oracle contract.

Complements the round-6 soak (seeds 101-260 ranges, 49 scenes, 0
failures); seeds here are disjoint.

Run (CPU-only): python scripts/soak_r8.py > /tmp/soak_r8.log 2>&1
"""
import os
import sys
import traceback

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
os.environ.setdefault("JAX_NUM_CPU_DEVICES", "8")

import jax

jax.config.update("jax_default_device", jax.local_devices(backend="cpu")[0])

import numpy as np

import test_fuzz as TF

F32 = np.float32


def plain(rng, seed):
    spheres = [(int(rng.integers(3, 8)) * 2,
                int(rng.integers(6, 16)))] if seed % 2 else []
    disks = [int(rng.integers(6, 24))] if seed % 3 == 0 else []
    scene = TF._rand_scene(rng, n_soup=int(rng.integers(2, 5)),
                           spheres=spheres, disks=disks)
    vp = TF._rand_viewport(rng, (48, 32), maxdepth=int(rng.integers(3, 6)))
    ps = int(rng.choice([16, 24, 40, 56]))
    rc = int(rng.choice([128, 256]))
    TF._assert_contract(scene, vp, ps, rc)
    return f"plain tris={len(scene.tris)} ps={ps} rc={rc}"


def lights(rng, seed):
    from rust_raytrace_tpu import oracle
    from rust_raytrace_tpu.engine import Engine
    from rust_raytrace_tpu.scene import LightSource

    scene = TF._rand_scene(rng, n_soup=int(rng.integers(2, 4)),
                           disks=[int(rng.integers(3, 8))])
    scene.lights = LightSource(
        orig=rng.uniform(-4, 4, 3).astype(F32) * np.asarray(
            [1, 1, 0], dtype=F32) + np.asarray([0, 16, 8], dtype=F32),
        len2=float(rng.uniform(0.0, 0.6)))
    vp = TF._rand_viewport(rng, (32, 24), maxdepth=int(rng.integers(3, 5)))
    ps = int(rng.choice([16, 24]))

    img_o = oracle.render(scene.tris, vp, rng=oracle.FixedRng(),
                          lights=scene.lights)
    e1 = Engine(scene, page_size=ps, ray_chunk=128, interpret=True,
                compact=True, auto_pages=False)
    e0 = Engine(scene, page_size=ps, ray_chunk=128, interpret=True,
                compact=False, auto_pages=False)
    i1 = e1.render(vp, fixed_rng=True, quantize=False).image
    i0 = e0.render(vp, fixed_rng=True, quantize=False).image
    np.testing.assert_array_equal(i1, i0)
    diff = np.abs(i1 - img_o).max(axis=-1)
    frac = float((diff > 1 / 255).mean())
    assert frac < 0.01, frac
    return (f"lights tris={len(scene.tris)} ps={ps} "
            f"shadow-boundary frac={frac:.4f}")


def multibank(rng, seed):
    # num_lat must be even (geometry.make_sphere); the sphere yields
    # 2*lon*(lat-1) triangles, which must exceed 128 pages' worth at P=8
    # (>= 1025) to force 2 banks: lat >= 24, lon >= 25 gives >= 1150
    scene = TF._rand_scene(rng, n_soup=2,
                           spheres=[(2 * int(rng.integers(12, 15)),
                                     int(rng.integers(25, 29)))])
    vp = TF._rand_viewport(rng, (24, 16), maxdepth=3)
    TF._assert_contract(scene, vp, page_size=8, ray_chunk=128, min_banks=2)
    return f"multibank tris={len(scene.tris)}"


def main():
    ok = bad = 0
    for seed in range(500, 560):
        if seed % 8 == 0:
            # each interpret-mode compile holds mmap'd executable pages;
            # ~42 soak scenes exhaust vm.max_map_count (65530) and LLVM
            # dies with "Cannot allocate memory" — drop the executables
            jax.clear_caches()
        rng = np.random.default_rng(seed)
        kind = (plain, lights, multibank)[seed % 3]
        try:
            info = kind(rng, seed)
            ok += 1
            print(f"seed {seed}: OK ({info})", flush=True)
        except Exception:
            bad += 1
            print(f"seed {seed}: FAILED\n{traceback.format_exc()[-1200:]}",
                  flush=True)
    print(f"soak done: {ok} ok, {bad} failed", flush=True)


if __name__ == "__main__":
    main()
