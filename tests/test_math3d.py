"""Math core tests (reference L0, raytrace_lib/src/raytrace.rs:22-173)."""

import numpy as np
import pytest

from rust_raytrace_tpu import math3d as m3

F32 = np.float32


def test_dot_cross_len(rng):
    a = rng.standard_normal((64, 3)).astype(F32)
    b = rng.standard_normal((64, 3)).astype(F32)
    np.testing.assert_allclose(m3.dot(a, b), np.einsum("ij,ij->i", a, b),
                               rtol=1e-6)
    np.testing.assert_allclose(m3.cross(a, b), np.cross(a, b), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(m3.len2(a), (a * a).sum(-1), rtol=1e-6)
    np.testing.assert_allclose(m3.length(a), np.sqrt((a * a).sum(-1)),
                               rtol=1e-6)


def test_unit(rng):
    a = rng.standard_normal((32, 3)).astype(F32) * 10
    u = m3.unit(a)
    np.testing.assert_allclose(m3.length(u), np.ones(32), rtol=1e-5)
    # direction preserved
    np.testing.assert_allclose(m3.unit(u), u, rtol=1e-5, atol=1e-6)


def test_orthogonal_single():
    for v in [(1.0, 0.0, 0.0), (0.0, 2.0, 0.0), (0.0, 0.0, -3.0),
              (0.3, -0.55, -0.5), (-0.5, 2.0, -0.5)]:
        a = np.asarray(v, dtype=F32)
        o = m3.orthogonal(a)
        assert abs(m3.dot(a, o)) < 1e-5
        assert abs(m3.length(o) - 1.0) < 1e-5


def test_orthogonal_batched_matches_single(rng):
    a = rng.standard_normal((16, 3)).astype(F32)
    batched = m3.orthogonal(a)
    for i in range(16):
        np.testing.assert_allclose(batched[i], m3.orthogonal(a[i]), rtol=1e-5,
                                   atol=1e-6)


def test_basis_orthonormal(rng):
    a = rng.standard_normal(3).astype(F32)
    bx, by, n = m3.basis(a)
    for u, v in [(bx, by), (bx, n), (by, n)]:
        assert abs(m3.dot(u, v)) < 1e-5
    np.testing.assert_allclose(m3.unit(a), n, rtol=1e-5)


def test_change_basis_is_row_matrix_product(rng):
    b = tuple(rng.standard_normal(3).astype(F32) for _ in range(3))
    v = rng.standard_normal((8, 3)).astype(F32)
    expect = v @ np.stack(b).T
    np.testing.assert_allclose(m3.change_basis(v, b), expect, rtol=1e-5,
                               atol=1e-6)


def test_make_color():
    c = m3.make_color((128, 180, 255))
    np.testing.assert_allclose(c, [128 / 255, 180 / 255, 255 / 255], rtol=1e-6)
    assert c.dtype == F32


def test_mix_color():
    c1 = m3.make_color((100, 0, 0))
    c2 = m3.make_color((0, 200, 0))
    # mix_color(c1, c2, a) = c1*(1-a) + c2*a (raytrace.rs:299-301)
    out = m3.mix_color(c1, c2, 0.25)
    np.testing.assert_allclose(out, c1 * 0.75 + c2 * 0.25, rtol=1e-6)
    # batched alpha
    a = np.asarray([0.0, 1.0, 0.5], dtype=F32)
    c1b = np.tile(c1, (3, 1))
    c2b = np.tile(c2, (3, 1))
    out = m3.mix_color(c1b, c2b, a)
    np.testing.assert_allclose(out[0], c1, rtol=1e-6)
    np.testing.assert_allclose(out[1], c2, rtol=1e-6)


def test_ray_intersect():
    # two rays crossing at (1, 1, 1) (raytrace.rs:231-267 semantics)
    p = m3.ray_intersect((0, 0, 0), m3.unit(m3.vec(1, 1, 1)),
                         (2, 0, 2), m3.unit(m3.vec(-1, 1, -1)))
    assert p is not None
    np.testing.assert_allclose(p, [1, 1, 1], atol=1e-5)

    # parallel rays: every projection is degenerate -> None
    assert m3.ray_intersect((0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 0, 0)) is None

    # skew rays far apart: solvable projection, |p2-p1|^2 >= 0.01 -> None
    assert m3.ray_intersect((0, 0, 0), (1, 0, 0), (0, 5, 1), (0, 0, 1)) is None

    # the reference accepts near-misses under the 0.01 len2 slack
    p = m3.ray_intersect((0, 0, 0), (1, 0, 0), (0, 0.05, 1),
                         m3.unit(m3.vec(0, 0, -1)))
    assert p is not None

    # xy projection parallel, xz solvable (the cascade of raytrace.rs:233-256)
    a_d = m3.unit(m3.vec(1, 0, 1))
    b_d = m3.unit(m3.vec(1, 0, -1))
    p = m3.ray_intersect((0, 0, 0), a_d, (0, 0, 2), b_d)
    assert p is not None
    np.testing.assert_allclose(p, [1, 0, 1], atol=1e-5)

    # negative t accepted (the reference places no t >= 0 constraint)
    p = m3.ray_intersect((0, 0, 0), (1, 0, 0), (-1, -1, 0), (0, -1, 0))
    assert p is not None
    np.testing.assert_allclose(p, [-1, 0, 0], atol=1e-5)
