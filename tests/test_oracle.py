"""Oracle renderer tests (shading semantics of raytrace.rs:1199-1295)."""

import numpy as np
import pytest

from rust_raytrace_tpu import math3d as m3
from rust_raytrace_tpu import oracle
from rust_raytrace_tpu.camera import create_viewport
from rust_raytrace_tpu.geometry import make_triangles
from rust_raytrace_tpu.materials import matte, reflective, solid
from rust_raytrace_tpu.scene import assemble

F32 = np.float32


def one_tri_scene(surface, edge_thickness=0.0, z=2.0, half=5.0):
    """Sentinel + one big triangle in the z=const plane facing the camera."""
    pts = np.asarray([[[-half, -half, z], [half, -half, z], [0, 2 * half, z]]],
                     dtype=F32)
    return assemble([make_triangles(pts, surface, edge_thickness)])


def vp(w=4, h=4, maxdepth=5):
    return create_viewport((w, h), (1.0, h / w), (0.0, 0.0, 0.0),
                           m3.unit(m3.vec(0.0, 0.0, 1.0)), 90.0, 0.0,
                           maxdepth, 1)


def test_miss_is_sky():
    scene = assemble([])  # only the sentinel
    img = oracle.render(scene.tris, vp(), rng=oracle.FixedRng())
    np.testing.assert_allclose(img, np.broadcast_to(oracle.SKY_COLOR,
                                                    img.shape), rtol=1e-6)


def test_solid_hit_color():
    scene = one_tri_scene(solid(m3.make_color((10, 200, 30))))
    img = oracle.render(scene.tris, vp(), rng=oracle.FixedRng())
    center = img[2, 2]
    np.testing.assert_allclose(center, m3.make_color((10, 200, 30)), rtol=1e-6)


def test_depth_zero_is_black():
    scene = one_tri_scene(solid(m3.make_color((10, 200, 30))))
    o = np.zeros(3, dtype=F32)
    d = np.asarray([0, 0, 1], dtype=F32)
    c = oracle.project_ray(scene.tris, o, d, 0, oracle.FixedRng())
    np.testing.assert_allclose(c, [0, 0, 0])


def test_matte_mixes_surface_with_bounce_sky():
    # Matte alpha=0.25 hit whose lambertian bounce escapes to the sky:
    # color = mix(surface, sky, 0.25) (raytrace.rs:1232-1240)
    surf = m3.make_color((252, 119, 0))
    scene = one_tri_scene(matte(surf, 0.25))
    o = np.zeros(3, dtype=F32)
    d = np.asarray([0, 0, 1], dtype=F32)
    rng = oracle.FixedRng((0.0, 0.6, -0.8))  # bounce heads away from triangle
    c = oracle.project_ray(scene.tris, o, d, 5, rng)
    expect = m3.mix_color(surf, oracle.SKY_COLOR, F32(0.25))
    np.testing.assert_allclose(c, expect, rtol=1e-5)


def test_matte_bounce_at_last_depth_is_black():
    surf = m3.make_color((252, 119, 0))
    scene = one_tri_scene(matte(surf, 0.25))
    o = np.zeros(3, dtype=F32)
    d = np.asarray([0, 0, 1], dtype=F32)
    rng = oracle.FixedRng((0.0, 0.6, -0.8))
    # depth=1: bounce is evaluated at depth 0 -> black (raytrace.rs:1261-1263)
    c = oracle.project_ray(scene.tris, o, d, 1, rng)
    expect = m3.mix_color(surf, np.zeros(3, dtype=F32), F32(0.25))
    np.testing.assert_allclose(c, expect, rtol=1e-5)


def test_reflective_zero_fuzz_mirror():
    # Mirror between two parallel planes: camera ray hits front triangle,
    # reflects straight back... use an angled setup instead: triangle at z=2
    # normal -z; ray along +z reflects to -z and escapes to sky.
    surf = m3.make_color((230, 230, 230))
    scene = one_tri_scene(reflective(surf, 0.7, 0.0))
    o = np.zeros(3, dtype=F32)
    d = np.asarray([0, 0, 1], dtype=F32)
    rng = oracle.FixedRng((1.0, 0.0, 0.0))  # fuzz=0 -> rand_vec unused
    c = oracle.project_ray(scene.tris, o, d, 5, rng)
    expect = m3.mix_color(surf, oracle.SKY_COLOR, F32(0.7))
    np.testing.assert_allclose(c, expect, rtol=1e-5)


def test_edge_band_shades_black():
    # edge_thickness=1.0 makes the entire triangle an edge band
    # (dist > side_len*(1-1.0)=0 almost everywhere) -> black wireframe
    scene = one_tri_scene(solid(m3.make_color((10, 200, 30))),
                          edge_thickness=1.0)
    img = oracle.render(scene.tris, vp(), rng=oracle.FixedRng())
    center = img[2, 2]
    np.testing.assert_allclose(center, [0, 0, 0], atol=1e-7)


def test_back_face_normal_flip():
    # Put the camera behind the triangle: ray hits the back face; for a
    # Matte surface the bounce leaves along the flipped normal; with a bounce
    # to sky the color is the same mix — verifying it doesn't self-intersect
    # (which would yield a darker recursive mix).
    surf = m3.make_color((100, 100, 100))
    pts = np.asarray([[[-5, -5, -2], [5, -5, -2], [0, 10, -2]]], dtype=F32)
    scene = assemble([make_triangles(pts, matte(surf, 0.5), 0.0)])
    o = np.zeros(3, dtype=F32)
    d = np.asarray([0, 0, -1], dtype=F32)
    rng = oracle.FixedRng((0.0, 0.6, 0.8))
    c = oracle.project_ray(scene.tris, o, d, 5, rng)
    expect = m3.mix_color(surf, oracle.SKY_COLOR, F32(0.5))
    np.testing.assert_allclose(c, expect, rtol=1e-5)


def test_nearest_hit_picks_closest():
    near = make_triangles(
        np.asarray([[[-5, -5, 2], [5, -5, 2], [0, 10, 2]]], dtype=F32),
        solid(m3.make_color((255, 0, 0))), 0.0)
    far = make_triangles(
        np.asarray([[[-5, -5, 4], [5, -5, 4], [0, 10, 4]]], dtype=F32),
        solid(m3.make_color((0, 255, 0))), 0.0)
    scene = assemble([far, near])  # near is index 2 (after sentinel, far)
    hit = oracle.nearest_hit(scene.tris, np.zeros(3, dtype=F32),
                             np.asarray([0, 0, 1], dtype=F32))
    assert hit is not None
    t, idx, edge, back = hit
    assert idx == 2
    assert abs(t - 2.0) < 1e-5


def test_sentinel_slot_never_hits():
    # A ray aimed straight at the dummy triangle still misses (slot 0 skipped)
    scene = assemble([])
    o = np.zeros(3, dtype=F32)
    d = m3.unit(np.asarray([1, 1, 1], dtype=F32))
    assert oracle.nearest_hit(scene.tris, o, d) is None


def test_ray_counting_stats():
    scene = one_tri_scene(matte(m3.make_color((252, 119, 0)), 0.25))
    stats = oracle.OracleStats()
    o = np.zeros(3, dtype=F32)
    d = np.asarray([0, 0, 1], dtype=F32)
    rng = oracle.FixedRng((0.0, 0.6, -0.8))
    oracle.project_ray(scene.tris, o, d, 5, rng, stats)
    # primary (hit) + bounce (miss -> sky) = 2 counted rays; the depth-0 call
    # never happens because the bounce missed.
    assert stats.rays == 2
