"""Multi-chip image-tile data parallelism tests (8 virtual CPU devices)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpret-mode kernels: minutes per module

import jax
import jax.numpy as jnp

from rust_raytrace_tpu import math3d as m3
from rust_raytrace_tpu.camera import camera_rays, create_viewport
from rust_raytrace_tpu.engine import Engine, _camera_rays_tiled
from rust_raytrace_tpu.geometry import make_sphere
from rust_raytrace_tpu.materials import matte
from rust_raytrace_tpu.parallel.sharding import (engine_render_sharded,
                                                 make_mesh, shard_rays,
                                                 trace_rays_sharded)
from rust_raytrace_tpu.render import upload_scene
from rust_raytrace_tpu.scene import assemble

F32 = np.float32


@pytest.fixture(scope="module")
def scene():
    return assemble([make_sphere((0.0, 0.0, 6.0), 2.0, (8, 12),
                                 matte(m3.make_color((252, 119, 0)), 0.2),
                                 0.05)])


@pytest.fixture(scope="module")
def vp():
    return create_viewport((32, 32), (1.0, 1.0), (0.0, 0.0, 0.0),
                           m3.unit(m3.vec(0.0, 0.0, 1.0)), 90.0, 0.0, 3, 1)


def test_mesh_has_8_devices():
    mesh = make_mesh(8)
    assert mesh.shape["tiles"] == 8


def test_sharded_trace_matches_single(scene, vp):
    st = upload_scene(scene, page_size=64)
    o, d = camera_rays(vp)
    mesh = make_mesh(8)
    os, ds = shard_rays(jnp.asarray(o), jnp.asarray(d), mesh)

    colors, wave_rays = trace_rays_sharded(
        st, os, ds, jax.random.PRNGKey(0), mesh, maxdepth=vp.maxdepth,
        backend="xla", ray_chunk=128, fixed_rng=True)
    colors = np.asarray(colors)
    assert int(np.asarray(wave_rays)[0]) == o.shape[0]

    from rust_raytrace_tpu.render import trace_rays

    colors1, aux1 = trace_rays(st, jnp.asarray(o), jnp.asarray(d),
                               jax.random.PRNGKey(0), maxdepth=vp.maxdepth,
                               backend="xla", ray_chunk=128, fixed_rng=True)
    np.testing.assert_allclose(colors, np.asarray(colors1), atol=1e-6)


def test_engine_sharded_bitexact(scene, vp):
    """Sharded PRODUCTION engine (compacted path) == unsharded engine,
    BIT-EXACT under FixedRng (VERDICT r2 missing #3): per-ray values are
    independent of chunk grouping, compaction is a reversed permutation, and
    under fixed_rng the per-chip key fold is inert — so sharding over 8
    devices must change nothing.  The multi-chip analog of the reference's
    differential methodology (debug.rs:150-222).  The engine carries an
    explicit skip-then-compact tuple schedule (the planner's shape) so the
    sharded path's schedule plumbing is exercised; the unsharded comparator
    runs a DIFFERENT schedule (all boundaries), which must not matter —
    every schedule is the same permutation, reversed."""
    from rust_raytrace_tpu.engine import _render_device_compact

    eng = Engine(scene, page_size=64, ray_chunk=128, interpret=True,
                 ncompact=(True, False, True, False))
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
        plt_i=eng.plt_i, plt_s=eng.plt_s, ab_tab=eng.ab_tab)

    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P(None, "tiles"))
    o_s = jax.device_put(o, sh)
    d_s = jax.device_put(d, sh)
    alive_s = jax.device_put(alive, NamedSharding(mesh, P("tiles")))
    img8, wc8 = engine_render_sharded(
        eng, o_s, d_s, alive_s, jax.random.PRNGKey(0), mesh,
        maxdepth=vp.maxdepth, interpret=True, fixed_rng=True, compact=True)

    np.testing.assert_array_equal(np.asarray(img8), np.asarray(img1))
    np.testing.assert_array_equal(np.asarray(wc8), np.asarray(wc1))


def test_engine_sharded_lights_bitexact(scene, vp):
    """Sharded engine on a LIGHTS scene == unsharded BITWISE: the light
    constants are replicated to every chip and the fused shadow feelers run
    per shard (rays, incl. feelers, are independent).  Before round 3's
    sharding extension the sharded path silently dropped the light."""
    from rust_raytrace_tpu.engine import _render_device_compact
    from rust_raytrace_tpu.scene import LightSource, assemble
    from rust_raytrace_tpu.geometry import make_sphere
    from rust_raytrace_tpu.materials import matte

    lscene = assemble([make_sphere((0.0, 0.0, 6.0), 2.0, (8, 12),
                                   matte(m3.make_color((252, 119, 0)), 0.2),
                                   0.05)])
    lscene.lights = LightSource(orig=np.asarray([0.0, 12.0, 4.0], dtype=F32),
                                len2=0.25)
    eng = Engine(lscene, page_size=64, ray_chunk=128, interpret=True)
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
        has_lights=True,
        light_orig=jnp.asarray(lscene.lights.orig, dtype=jnp.float32),
        light_len2=jnp.asarray(lscene.lights.len2, dtype=jnp.float32),
        plt_i=eng.plt_i, plt_s=eng.plt_s, ab_tab=eng.ab_tab,
        ncompact=eng.ncompact)

    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P(None, "tiles"))
    img8, wc8 = engine_render_sharded(
        eng, jax.device_put(o, sh), jax.device_put(d, sh),
        jax.device_put(alive, NamedSharding(mesh, P("tiles"))),
        jax.random.PRNGKey(0), mesh, maxdepth=vp.maxdepth, interpret=True,
        fixed_rng=True, compact=True)
    # the light must actually darken something vs an unlit render — guard
    # against a silently-dropped light making this test vacuous
    eng_nolight = Engine(scene, page_size=64, ray_chunk=128, interpret=True)
    img_nl, _, _, _ = _render_device_compact(
        eng_nolight.tensors, eng_nolight.aabb_lo, eng_nolight.aabb_hi, o, d,
        alive, jax.random.PRNGKey(0), maxdepth=vp.maxdepth, ray_chunk=RB,
        page_size=eng_nolight.page_size, fixed_rng=True, interpret=True,
        want_primary=False, quantize=True, weight_cutoff=0.0,
        plt_i=eng_nolight.plt_i, plt_s=eng_nolight.plt_s,
        ab_tab=eng_nolight.ab_tab, ncompact=eng_nolight.ncompact)
    assert (np.asarray(img1) != np.asarray(img_nl)).any()
    np.testing.assert_array_equal(np.asarray(img8), np.asarray(img1))
    np.testing.assert_array_equal(np.asarray(wc8), np.asarray(wc1))


def test_engine_sharded_spp_bitexact(scene, vp):
    """Sharded engine at spp=2 == unsharded BITWISE: sample groups ride
    adjacent lanes and never straddle shards, so each shard's on-device box
    filter reproduces the single-chip average exactly."""
    from rust_raytrace_tpu.engine import _render_device_compact

    spp = 2
    eng = Engine(scene, page_size=64, ray_chunk=128, interpret=True)
    mesh = make_mesh(8)
    RB = eng.ray_chunk
    R0 = vp.height * vp.width * spp
    R = -(-R0 // (8 * RB)) * 8 * RB

    o, d = _camera_rays_tiled(
        jnp.asarray(vp.orig), jnp.asarray(vp.cam), jnp.asarray(vp.vu),
        jnp.asarray(vp.vv), jax.random.PRNGKey(0), width=vp.width,
        height=vp.height, spp=spp, tile=16, n_pad=R)
    alive = jnp.arange(R) < R0

    img1, wc1, _, _ = _render_device_compact(
        eng.tensors, eng.aabb_lo, eng.aabb_hi, o, d, alive,
        jax.random.PRNGKey(0), maxdepth=vp.maxdepth, ray_chunk=RB,
        page_size=eng.page_size, fixed_rng=True, interpret=True,
        want_primary=False, quantize=True, weight_cutoff=0.0,
        plt_i=eng.plt_i, plt_s=eng.plt_s, ab_tab=eng.ab_tab,
        ncompact=eng.ncompact, spp=spp)

    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P(None, "tiles"))
    img8, wc8 = engine_render_sharded(
        eng, jax.device_put(o, sh), jax.device_put(d, sh),
        jax.device_put(alive, NamedSharding(mesh, P("tiles"))),
        jax.random.PRNGKey(0), mesh, maxdepth=vp.maxdepth, interpret=True,
        fixed_rng=True, compact=True, spp=spp)
    assert np.asarray(img8).shape == (3, R // spp)
    np.testing.assert_array_equal(np.asarray(img8), np.asarray(img1))
    np.testing.assert_array_equal(np.asarray(wc8), np.asarray(wc1))


def test_render_sharded_user_api(scene, vp):
    """Engine.render_sharded (the user-facing multi-chip render) ==
    Engine.render bit-exactly under fixed_rng: same viewport in, same
    RenderResult image/wave counts out — no manual camera-ray plumbing."""
    eng = Engine(scene, page_size=64, ray_chunk=128, interpret=True)
    mesh = make_mesh(8)
    r1 = eng.render(vp, fixed_rng=True)
    r8 = eng.render_sharded(vp, mesh=mesh, fixed_rng=True)
    assert r8.image.dtype == np.uint8
    np.testing.assert_array_equal(r8.image, r1.image)
    np.testing.assert_array_equal(r8.wave_rays, r1.wave_rays)
    assert r8.rays_traced == r1.rays_traced


def test_render_sharded_spp_float(scene):
    """render_sharded at spp=2 with float output == render: the raw sample
    buffer crosses shards and the host box filter reproduces the
    single-chip average bitwise (same addends, same order)."""
    vp2 = create_viewport((32, 32), (1.0, 1.0), (0.0, 0.0, 0.0),
                          m3.unit(m3.vec(0.0, 0.0, 1.0)), 90.0, 0.0, 3, 2)
    eng = Engine(scene, page_size=64, ray_chunk=128, interpret=True)
    r1 = eng.render(vp2, fixed_rng=True, quantize=False)
    r8 = eng.render_sharded(vp2, mesh=make_mesh(8), fixed_rng=True,
                            quantize=False)
    assert r8.image.dtype == np.float32
    np.testing.assert_array_equal(r8.image, r1.image)


def test_render_sharded_debug_surface(scene, vp):
    """render_sharded(debug=True) returns the primary hit t/id buffers ==
    render(debug=True)'s bitwise under fixed_rng (VERDICT r3 missing #2):
    each shard records its own wave-0 slice, so the differ (`cli diff`,
    debug.rs:150-222) works on multi-chip renders."""
    eng = Engine(scene, page_size=64, ray_chunk=128, interpret=True)
    r1 = eng.render(vp, fixed_rng=True, debug=True)
    r8 = eng.render_sharded(vp, mesh=make_mesh(8), fixed_rng=True,
                            debug=True)
    assert r8.primary_t is not None and r8.primary_id is not None
    np.testing.assert_array_equal(r8.primary_id, r1.primary_id)
    np.testing.assert_array_equal(r8.primary_t, r1.primary_t)
    np.testing.assert_array_equal(r8.image, r1.image)
    # the surface is real: some pixels hit (nonzero ids) and some miss
    assert (r8.primary_id != 0).any() and (r8.primary_id == 0).any()


def test_render_sharded_streamed_bitexact():
    """render_sharded == render() bitwise on a FORCED-STREAMED engine
    (VERDICT r4 missing #4): the sharded path plumbs the HBM bank tables
    (parallel/sharding.py) and each shard runs the bank-worklist kernel —
    the multi-chip surface of the newest regime, pinned like the banked
    one.  The scene spans >= 3 banks at page_size 8, so the worklist and
    cross-bank cut exercise for real on every shard."""
    from rust_raytrace_tpu.camera import create_viewport

    s = assemble([make_sphere((0.0, 0.0, 6.0), 2.5, (40, 40),
                              matte(m3.make_color((252, 119, 0)), 0.2),
                              0.0)])
    vp4 = create_viewport((32, 32), (1.0, 1.0), (0.0, 0.0, 0.0),
                          m3.unit(m3.vec(0.0, 0.0, 1.0)), 90.0, 0.0, 4, 1)
    eng = Engine(s, page_size=8, ray_chunk=128, interpret=True,
                 auto_pages=False, streamed=True)
    assert eng.streamed and eng.slt_i is not None
    assert eng.slt_i.shape[0] >= 3
    r1 = eng.render(vp4, fixed_rng=True)
    r8 = eng.render_sharded(vp4, mesh=make_mesh(8), fixed_rng=True)
    np.testing.assert_array_equal(r8.image, r1.image)
    np.testing.assert_array_equal(r8.wave_rays, r1.wave_rays)
    # the surface is real: hits and misses both present
    assert (r1.image != r1.image[:, :1, :1]).any()


def test_engine_sharded_dryrun(scene, vp):
    """Full engine pipeline (cull + Pallas trace in interpret mode + shade)
    sharded over the 8-device mesh."""
    eng = Engine(scene, page_size=64, ray_chunk=64, interpret=True)
    mesh = make_mesh(8)
    RB = eng.ray_chunk
    R0 = vp.height * vp.width
    R = -(-R0 // (8 * RB)) * 8 * RB

    o, d = _camera_rays_tiled(
        jnp.asarray(vp.orig), jnp.asarray(vp.cam), jnp.asarray(vp.vu),
        jnp.asarray(vp.vv), jax.random.PRNGKey(0), width=vp.width,
        height=vp.height, spp=1, tile=16, n_pad=R)
    alive = jnp.arange(R) < R0
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P(None, "tiles"))
    o = jax.device_put(o, sh)
    d = jax.device_put(d, sh)
    alive = jax.device_put(alive, NamedSharding(mesh, P("tiles")))

    img, wave_counts = engine_render_sharded(
        eng, o, d, alive, jax.random.PRNGKey(0), mesh,
        maxdepth=vp.maxdepth, interpret=True)
    img = np.asarray(img)
    assert img.shape == (3, R)
    assert img.dtype == np.uint8
    assert int(np.asarray(wave_counts)[0]) == R0
    # sky pixels present and correctly quantized
    assert (img[2] == 255).any()
