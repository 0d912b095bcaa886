"""Round-10 randomized soak: fresh disjoint seeds through three contract
combinations never randomized before:

  - spp:     random scene at samples in {2,4} — compacted pipeline ==
             legacy pipeline BITWISE (float and quantized framebuffers),
             generalizing test_bitexact.test_spp4_compact_equals_legacy
             beyond the curated circles scene.
  - sharded: random scene on the 8-virtual-device mesh with a RANDOM
             tuple compaction schedule — sharded production engine ==
             unsharded BITWISE (image + wave counts), generalizing
             test_sharding.test_engine_sharded_bitexact.
  - objrt:   random mesh round-tripped through an .obj/.mtl ON DISK and
             the generic user-OBJ scene (models/objfile.py): parsed
             corners equal the written vertices bitwise (f32 %.9g text
             round-trip), then the full engine == xla == oracle
             differential contract on the parsed scene.

Earlier soaks used seed ranges 101-260 (r6, 49 scenes) and 500-559 (r8,
60 scenes); seeds here are 700-744 (45 scenes), disjoint.

Run (CPU-only): python scripts/soak_r10.py > /tmp/soak_r10.log 2>&1
"""
import os
import sys
import traceback

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
# JAX_NUM_CPU_DEVICES set via os.environ after process start is IGNORED on
# this box (the axon plugin initializes backends early); the XLA flag is
# honored — same recipe as tests/conftest.py
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


def spp(rng, seed):
    from rust_raytrace_tpu.camera import create_viewport
    from rust_raytrace_tpu.engine import Engine
    from rust_raytrace_tpu import math3d as m3

    scene = TF._rand_scene(rng, n_soup=int(rng.integers(2, 4)),
                           disks=[int(rng.integers(3, 8))] if seed % 2 else [])
    samples = int(rng.choice([2, 4]))
    px = (24, 16)
    pos = rng.uniform(-0.4, 0.4, 3).astype(F32)
    aim = m3.unit(np.asarray(
        [rng.uniform(-0.25, 0.25), rng.uniform(-0.25, 0.25), 1.0], dtype=F32))
    vp = create_viewport(px, (1.5, 1.5 * px[1] / px[0]), pos, aim,
                         float(rng.uniform(60.0, 100.0)),
                         float(rng.uniform(-0.3, 0.3)),
                         int(rng.integers(3, 5)), samples)
    ps = int(rng.choice([16, 24, 40]))
    e1 = Engine(scene, page_size=ps, ray_chunk=128, interpret=True,
                compact=True, auto_pages=False)
    e0 = Engine(scene, page_size=ps, ray_chunk=128, interpret=True,
                compact=False, auto_pages=False)
    i1 = e1.render(vp, fixed_rng=True, quantize=False).image
    i0 = e0.render(vp, fixed_rng=True, quantize=False).image
    np.testing.assert_array_equal(i1, i0)
    q1 = e1.render(vp, fixed_rng=True, quantize=True).image
    q0 = e0.render(vp, fixed_rng=True, quantize=True).image
    np.testing.assert_array_equal(q1, q0)
    return f"spp tris={len(scene.tris)} spp={samples} ps={ps}"


def sharded(rng, seed):
    import jax.numpy as jnp

    from rust_raytrace_tpu.engine import Engine, _camera_rays_tiled
    from rust_raytrace_tpu.engine import _render_device_compact
    from rust_raytrace_tpu.parallel.sharding import (engine_render_sharded,
                                                     make_mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    scene = TF._rand_scene(rng, n_soup=int(rng.integers(2, 4)),
                           spheres=[(6, 8)] if seed % 2 else [])
    vp = TF._rand_viewport(rng, (32, 24), maxdepth=3)
    schedule = tuple(bool(rng.integers(0, 2)) for _ in range(4))
    if not any(schedule):
        schedule = (True,) + schedule[1:]
    eng = Engine(scene, page_size=int(rng.choice([16, 24])), ray_chunk=128,
                 interpret=True, ncompact=schedule, auto_pages=False)
    mesh = make_mesh(8)
    RB = eng.ray_chunk
    R0 = vp.height * vp.width
    R = -(-R0 // (8 * RB)) * 8 * RB

    o, d = _camera_rays_tiled(
        jnp.asarray(vp.orig), jnp.asarray(vp.cam), jnp.asarray(vp.vu),
        jnp.asarray(vp.vv), jax.random.PRNGKey(0), width=vp.width,
        height=vp.height, spp=1, tile=16, n_pad=R)
    alive = jnp.arange(R) < R0

    img1, wc1, _, _ = _render_device_compact(
        eng.tensors, eng.aabb_lo, eng.aabb_hi, o, d, alive,
        jax.random.PRNGKey(0), maxdepth=vp.maxdepth, ray_chunk=RB,
        page_size=eng.page_size, fixed_rng=True, interpret=True,
        want_primary=False, quantize=True, weight_cutoff=0.0,
        plt_i=eng.plt_i, plt_s=eng.plt_s, ab_tab=eng.ab_tab,
        ncompact=eng.ncompact)

    sh = NamedSharding(mesh, P(None, "tiles"))
    o_s = jax.device_put(o, sh)
    d_s = jax.device_put(d, sh)
    alive_s = jax.device_put(alive, NamedSharding(mesh, P("tiles")))
    img8, wc8 = engine_render_sharded(
        eng, o_s, d_s, alive_s, jax.random.PRNGKey(0), mesh,
        maxdepth=vp.maxdepth, interpret=True, fixed_rng=True, compact=True)
    np.testing.assert_array_equal(np.asarray(img8), np.asarray(img1))
    np.testing.assert_array_equal(np.asarray(wc8), np.asarray(wc1))
    return (f"sharded tris={len(scene.tris)} ps={eng.page_size} "
            f"schedule={''.join(str(int(b)) for b in schedule)}")


def objrt(rng, seed, tmpdir="/tmp/soak_r10_assets"):
    from rust_raytrace_tpu.models import objfile

    os.makedirs(tmpdir, exist_ok=True)
    n_tris = int(rng.integers(6, 30))
    # vertices near the +z cluster; %.9g text round-trips f32 exactly
    verts = (rng.uniform(-2, 2, (3 * n_tris, 3)).astype(F32)
             + np.asarray([0, 0, 8], dtype=F32))
    obj_path = os.path.join(tmpdir, f"mesh_{seed}.obj")
    mtl_name = f"mesh_{seed}.mtl"
    with open(os.path.join(tmpdir, mtl_name), "w") as f:
        f.write("newmtl red\nKd 0.8 0.1 0.1\nNs 10\n"
                "newmtl mirror\nKd 0.9 0.9 0.9\nKs 1.0 1.0 1.0\nNs 900\n")
    with open(obj_path, "w") as f:
        f.write(f"mtllib {mtl_name}\n")
        for v in verts:
            f.write("v %.9g %.9g %.9g\n" % tuple(float(x) for x in v))
        for i in range(n_tris):
            f.write("usemtl %s\n" % ("red" if i % 2 else "mirror"))
            f.write("f %d %d %d\n" % (3 * i + 1, 3 * i + 2, 3 * i + 3))

    scene, vp = objfile.build(resolution=(24, 16), maxdepth=3,
                              obj_path=obj_path)
    assert scene.num_triangles == n_tris + 1  # + miss sentinel
    # bitwise round trip: corners (skipping sentinel) == written vertices
    np.testing.assert_array_equal(
        scene.tris.corners[1:].reshape(-1, 3), verts)
    TF._assert_contract(scene, vp, page_size=16, ray_chunk=128)
    return f"objrt tris={n_tris}"


def main():
    ok = bad = 0
    for seed in range(700, 745):
        if seed % 8 == 0:
            # interpret-mode executables exhaust vm.max_map_count after
            # ~42 compiles (measured, soak_r8) — drop them periodically
            jax.clear_caches()
        rng = np.random.default_rng(seed)
        kind = (spp, sharded, objrt)[seed % 3]
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
