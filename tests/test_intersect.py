"""Differential tests of the three nearest-hit implementations.

Methodology follows the reference's own (kernel vs pure-host model diffed per
ray, cuda_raytrace.rs:387-420):
  - numpy model (intersect_ref)  vs  geometric brute force (oracle.intersect_all)
  - XLA scan (intersect_xla)     vs  numpy model (bit-tight, same formulas)
  - Pallas interpret mode        vs  numpy model
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpret-mode kernels: minutes per module

from rust_raytrace_tpu import math3d as m3
from rust_raytrace_tpu import oracle
from rust_raytrace_tpu.camera import camera_rays, create_viewport
from rust_raytrace_tpu.geometry import make_sphere, make_triangles
from rust_raytrace_tpu.materials import solid
from rust_raytrace_tpu.ops.intersect_ref import nearest_hit_model
from rust_raytrace_tpu.ops.pages import build_pages
from rust_raytrace_tpu.scene import assemble

F32 = np.float32


@pytest.fixture(scope="module")
def sphere_scene():
    """Sentinel + a 148-triangle sphere shell + one floor triangle."""
    s = make_sphere((0.0, 0.0, 6.0), 2.0, (8, 12),
                    solid(m3.make_color((200, 60, 60))), -1.0)
    floor = make_triangles(
        np.asarray([[[-20, -3, -10], [20, -3, -10], [0, -3, 40]]], dtype=F32),
        solid(m3.make_color((120, 120, 120))), 0.0)
    return assemble([s, floor])


@pytest.fixture(scope="module")
def rays():
    vp = create_viewport((24, 18), (1.0, 0.75), (0.0, 0.0, 0.0),
                         m3.unit(m3.vec(0.0, 0.0, 1.0)), 90.0, 0.0, 5, 1)
    return camera_rays(vp)


def brute_force_expected(tris, O, D):
    ts, ids = [], []
    for o, d in zip(O, D):
        hit = oracle.nearest_hit(tris, o, d)
        if hit is None:
            ts.append(np.inf)
            ids.append(0)
        else:
            ts.append(hit[0])
            ids.append(hit[1])
    return np.asarray(ts, dtype=F32), np.asarray(ids, dtype=np.int32)


@pytest.mark.parametrize("page_size", [64, 128])
def test_model_matches_geometric_bruteforce(sphere_scene, rays, page_size):
    O, D = rays
    pages = build_pages(sphere_scene.tris, page_size=page_size)
    t_m, id_m = nearest_hit_model(O, D, pages)
    t_e, id_e = brute_force_expected(sphere_scene.tris, O, D)

    # Hit/miss sets must agree exactly; hit ids may differ only via fp ties.
    assert ((id_m == 0) == (id_e == 0)).all()
    hit = id_e != 0
    # hit distance agreement (different formula arrangement -> tolerance)
    np.testing.assert_allclose(t_m[hit], t_e[hit], rtol=1e-4, atol=1e-5)
    mismatch = (id_m != id_e) & hit
    assert mismatch.mean() < 0.01, np.nonzero(mismatch)


def test_xla_matches_model(sphere_scene, rays):
    import jax.numpy as jnp

    from rust_raytrace_tpu.ops.intersect_xla import (device_pages,
                                                     nearest_hit_xla)

    O, D = rays
    pages = build_pages(sphere_scene.tris, page_size=64)
    t_m, id_m = nearest_hit_model(O, D, pages)
    PK = device_pages(pages)
    t_x, id_x = nearest_hit_xla(jnp.asarray(O), jnp.asarray(D), PK, 64)
    t_x, id_x = np.asarray(t_x), np.asarray(id_x)

    assert (id_x == id_m).mean() > 0.999
    both = np.isfinite(t_m) & np.isfinite(t_x)
    np.testing.assert_allclose(t_x[both], t_m[both], rtol=1e-5, atol=1e-6)
    assert ((id_x == 0) == (id_m == 0)).all()


def test_pallas_interpret_matches_model(sphere_scene, rays):
    import jax.numpy as jnp

    from rust_raytrace_tpu.ops.intersect_pallas import nearest_hit_pallas

    O, D = rays
    pages = build_pages(sphere_scene.tris, page_size=64)
    t_m, id_m = nearest_hit_model(O, D, pages)
    t_p, id_p = nearest_hit_pallas(jnp.asarray(O), jnp.asarray(D),
                                   jnp.asarray(pages.PK),
                                   page_size=64, ray_chunk=128,
                                   interpret=True)
    t_p, id_p = np.asarray(t_p), np.asarray(id_p)

    assert (id_p == id_m).mean() > 0.999
    both = np.isfinite(t_m) & np.isfinite(t_p)
    np.testing.assert_allclose(t_p[both], t_m[both], rtol=1e-5, atol=1e-6)
    assert ((id_p == 0) == (id_m == 0)).all()


def test_pallas_ray_padding(sphere_scene):
    """R not a multiple of ray_chunk: padded rays must not leak into output."""
    import jax.numpy as jnp

    from rust_raytrace_tpu.ops.intersect_pallas import nearest_hit_pallas

    O = np.zeros((37, 3), dtype=F32)
    D = np.tile(m3.unit(m3.vec(0.0, 0.0, 1.0)), (37, 1))
    pages = build_pages(sphere_scene.tris, page_size=64)
    t, i = nearest_hit_pallas(jnp.asarray(O), jnp.asarray(D),
                              jnp.asarray(pages.PK),
                              page_size=64, ray_chunk=128, interpret=True)
    assert t.shape == (37,)
    assert np.asarray(i).min() >= 0
    # all rays aim at the sphere dead-center: all hit the same triangle
    assert len(set(np.asarray(i).tolist())) == 1
    assert np.isfinite(np.asarray(t)).all()


def test_sentinel_and_padding_never_hit(sphere_scene):
    """Aim all rays above the scene; every ray must report the miss sentinel."""
    O, D = camera_rays(create_viewport((16, 16), (1.0, 1.0), (0.0, 0.0, 0.0),
                                       m3.unit(m3.vec(0.0, 1.0, 0.0)), 90.0,
                                       0.0, 5, 1))
    pages = build_pages(sphere_scene.tris, page_size=64)
    t_m, id_m = nearest_hit_model(O, D, pages)
    # camera looks away from the scene -> everything misses
    assert (id_m == 0).all()
    assert np.isinf(t_m).all()
