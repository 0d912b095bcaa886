"""Camera/viewport tests (reference raytrace.rs:1305-1394).

The key contract: with the main.rs camera (pos [2,0,0], dir +z, fov 90,
roll 0, spp 1), rays must reproduce `pixel_ray`'s exact geometry, including the
un-rotated viewport-origin offset quirk (raytrace.rs:1349).
"""

import numpy as np

from rust_raytrace_tpu import math3d as m3
from rust_raytrace_tpu.camera import (camera_rays, create_transform,
                                      create_viewport, pixel_rays)

F32 = np.float32


def scalar_pixel_ray(v, row, col, u_off=0.5, v_off=0.5):
    """Direct transliteration of the reference pixel_ray (raytrace.rs:1374-1394)
    used as an independent oracle for the batched implementation."""
    vu_delta = v.vu * (1.0 / v.width)
    vv_delta = v.vv * (1.0 / v.height)
    px_u = v.orig + vu_delta * (col + u_off) + vv_delta * (row + v_off)
    d = px_u - v.cam
    return px_u, d / np.linalg.norm(d)


def main_rs_viewport(width=64, height=64):
    aspect = height / width
    return create_viewport((width, height), (1.0, aspect), (2.0, 0.0, 0.0),
                           m3.unit(m3.vec(0.0, 0.0, 1.0)), 90.0, 0.0, 5, 1)


def test_identity_transform():
    # dir = +z, roll 0 -> identity-ish frame
    b0, b1, b2 = create_transform(m3.vec(0.0, 0.0, 1.0), 0.0)
    np.testing.assert_allclose(b0, [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(b1, [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(b2, [0, 0, 1], atol=1e-6)


def test_transform_rows_orthonormal():
    for d, roll in [((0.0, 0.3, 1.0), np.radians(270.0)),
                    ((1.0, 0.2, -0.5), 0.3), ((0.0, 1.0, 0.0), 0.0)]:
        b = create_transform(m3.unit(np.asarray(d, dtype=F32)), roll)
        mat = np.stack(b)
        np.testing.assert_allclose(mat @ mat.T, np.eye(3), atol=1e-5)


def test_viewport_geometry_fov90():
    v = main_rs_viewport()
    # dist = 0.5/tan(45 deg) = 0.5 (raytrace.rs:1345)
    np.testing.assert_allclose(v.cam, [2.0, 0.0, -0.5], atol=1e-6)
    np.testing.assert_allclose(v.orig, [2.5, -0.5, 0.0], atol=1e-6)
    np.testing.assert_allclose(v.vu, [0.0, 1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(v.vv, [-1.0, 0.0, 0.0], atol=1e-6)


def test_pixel_rays_match_scalar_reference():
    v = main_rs_viewport(17, 13)
    for row in [0, 5, 12]:
        for col in [0, 7, 16]:
            o, d = pixel_rays(v, np.asarray(row), np.asarray(col))
            oe, de = scalar_pixel_ray(v, row, col)
            np.testing.assert_allclose(o, oe, rtol=1e-6, atol=1e-7)
            np.testing.assert_allclose(d, de, rtol=1e-5, atol=1e-6)


def test_camera_rays_row_major_layout():
    v = main_rs_viewport(8, 4)
    o, d = camera_rays(v)
    assert o.shape == (32, 3) and d.shape == (32, 3)
    # entry [row*W + col] equals pixel_rays(row, col)
    for row, col in [(0, 0), (1, 3), (3, 7)]:
        oe, de = pixel_rays(v, np.asarray(row), np.asarray(col))
        np.testing.assert_allclose(o[row * 8 + col], oe, rtol=1e-6)
        np.testing.assert_allclose(d[row * 8 + col], de, rtol=1e-6)


def test_center_ray_points_at_view_dir():
    v = main_rs_viewport(64, 64)
    o, d = pixel_rays(v, np.asarray(31), np.asarray(31), jitter=(1.0, 1.0))
    # exact image center (row 31 + 1.0 offset = 32 = h/2)
    np.testing.assert_allclose(d, [0, 0, 1], atol=1e-5)


def test_jitter_moves_ray_inside_pixel():
    v = main_rs_viewport(64, 64)
    o0, _ = pixel_rays(v, np.asarray(10), np.asarray(20), jitter=(0.0, 0.0))
    o1, _ = pixel_rays(v, np.asarray(10), np.asarray(20), jitter=(1.0, 1.0))
    delta = np.abs(o1 - o0)
    # one pixel pitch in each image-plane direction
    np.testing.assert_allclose(np.linalg.norm(delta),
                               np.linalg.norm(v.vu / 64 + v.vv / 64), rtol=1e-5)
