"""Triangle precompute + procedural geometry tests (reference L1,
raytrace.rs:326-592)."""

import numpy as np
import pytest

from rust_raytrace_tpu import math3d as m3
from rust_raytrace_tpu.geometry import (TriangleArrays, dummy_triangle,
                                        make_disk, make_sphere, make_triangles)
from rust_raytrace_tpu.materials import (KIND_MATTE, KIND_REFLECTIVE,
                                         KIND_SOLID, matte, reflective, solid)

F32 = np.float32


def tri(points):
    return make_triangles(np.asarray([points], dtype=F32),
                          solid(m3.make_color((255, 0, 0))), 0.0)


def test_centroid_and_norm():
    t = tri([[0, 0, 0], [1, 0, 0], [0, 1, 0]])
    np.testing.assert_allclose(t.incenter[0], [1 / 3, 1 / 3, 0], rtol=1e-6)
    # norm = unit(sides[0] x sides[1]) (raytrace.rs:370); for this winding it
    # points along -z (sides are centroid->edge perpendiculars).
    assert abs(abs(t.norm[0][2]) - 1.0) < 1e-6
    assert np.allclose(t.norm[0][:2], 0, atol=1e-6)


def test_sides_are_unit_inward_edge_perpendiculars():
    pts = np.asarray([[0, 0, 0], [2, 0, 0], [0, 3, 0]], dtype=F32)
    t = tri(pts)
    c = t.incenter[0]
    for i in range(3):
        s = t.sides[0, i]
        l = t.side_lens[0, i]
        assert abs(m3.length(s) - 1.0) < 1e-5
        # side vector is perpendicular to its edge
        edge = pts[(i + 1) % 3] - pts[i]
        assert abs(m3.dot(s, edge)) < 1e-5
        # centroid + side*len lands on the edge line
        foot = c + s * l
        # distance from foot to the edge line should be ~0
        ap = foot - pts[i]
        cross = np.linalg.norm(np.cross(ap, edge)) / np.linalg.norm(edge)
        assert cross < 1e-5
        # corners are OUTSIDE the side band: dot(corner-c, s) > l for the
        # opposite corner direction... the defining property used by the hit
        # test is dot(p-c, s) <= l for p inside.
        inside_pt = c  # centroid itself
        assert m3.dot(inside_pt - c, s) <= l


def test_halfplane_test_classifies_points():
    pts = np.asarray([[0, 0, 0], [4, 0, 0], [0, 4, 0]], dtype=F32)
    t = tri(pts)
    c, s, l = t.incenter[0], t.sides[0], t.side_lens[0]

    def inside(p):
        d = np.einsum("kc,c->k", s, np.asarray(p, dtype=F32) - c)
        return bool((d <= l).all())

    assert inside([1, 1, 0])
    assert inside([0.1, 0.1, 0])
    assert not inside([3, 3, 0])       # beyond the hypotenuse
    assert not inside([-0.5, 1, 0])    # left of edge 0-2
    assert not inside([1, -0.5, 0])    # below edge 0-1


def test_bounding_r2_covers_corners():
    pts = np.asarray([[0, 0, 0], [5, 0, 0], [1, 2, 0]], dtype=F32)
    t = tri(pts)
    r2 = t.bounding_r2[0]
    for p in pts:
        assert m3.len2(p - t.incenter[0]) <= r2 * (1 + 1e-6)
    # tight: equals max corner distance (raytrace.rs:375)
    assert abs(r2 - max(m3.len2(p - t.incenter[0]) for p in pts)) < 1e-4


def test_dummy_triangle_is_sentinel_shape():
    d = dummy_triangle()
    assert len(d) == 1
    np.testing.assert_allclose(d.corners[0],
                               [[1, 0, 0], [0, 1, 0], [0, 0, 1]], rtol=1e-6)
    assert d.materials.kind[0] == KIND_SOLID
    np.testing.assert_allclose(d.materials.color[0], [1, 0, 0], rtol=1e-6)


def test_make_sphere_counts_and_radius():
    # counts per reference loop (raytrace.rs:473-526): num_lon per row plus an
    # extra triangle for interior rows.
    num_lat, num_lon = 8, 12
    orig = np.asarray([1.0, 2.0, 3.0], dtype=F32)
    r = 2.0
    s = make_sphere(orig, r, (num_lat, num_lon),
                    matte(m3.make_color((10, 20, 30)), 0.5), 0.0)
    expect = num_lat * num_lon + (num_lat - 2) * num_lon
    assert len(s) == expect
    # all corners on the sphere surface
    d = np.linalg.norm(s.corners.reshape(-1, 3) - orig, axis=-1)
    np.testing.assert_allclose(d, r, rtol=1e-4)
    assert (s.materials.kind == KIND_MATTE).all()


def test_make_disk_counts_and_geometry():
    orig = np.asarray([0.0, 0.0, 5.0], dtype=F32)
    norm = m3.unit(m3.vec(0.0, 0.0, 1.0))
    n = 10
    disk = make_disk(orig, norm, r=2.0, d=0.1, num_tris=n,
                     surface=reflective(m3.make_color((230, 230, 230)), 0.7,
                                        0.0002),
                     side_surface=matte(m3.make_color((40, 40, 40)), 0.2),
                     edge_thickness=-1.0)
    assert len(disk) == 4 * n
    # interleave order: top, bottom, side, side per wedge (raytrace.rs:565-586)
    kinds = disk.materials.kind.reshape(n, 4)
    assert (kinds[:, 0] == KIND_REFLECTIVE).all()
    assert (kinds[:, 1] == KIND_REFLECTIVE).all()
    assert (kinds[:, 2] == KIND_MATTE).all()
    assert (kinds[:, 3] == KIND_MATTE).all()
    # face triangles lie in the z = 5 +/- 0.1 planes
    top = disk.corners[0::4].reshape(-1, 3)
    bot = disk.corners[1::4].reshape(-1, 3)
    np.testing.assert_allclose(top[:, 2], 5.1, atol=1e-5)
    np.testing.assert_allclose(bot[:, 2], 4.9, atol=1e-5)
    # rim corners at radius r from the axis
    rim_first = disk.corners[0::4, 1:]  # corners 2,3 of top faces
    rr = np.linalg.norm(rim_first.reshape(-1, 3)[:, :2], axis=-1)
    np.testing.assert_allclose(rr, 2.0, rtol=1e-5)


def test_concat_preserves_rows():
    a = tri([[0, 0, 0], [1, 0, 0], [0, 1, 0]])
    b = make_triangles(
        np.asarray([[[0, 0, 1], [1, 0, 1], [0, 1, 1]]], dtype=F32),
        matte(m3.make_color((1, 2, 3)), 0.9), 0.25)
    cat = TriangleArrays.concat([a, b])
    assert len(cat) == 2
    np.testing.assert_allclose(cat.incenter[0], a.incenter[0])
    np.testing.assert_allclose(cat.incenter[1], b.incenter[0])
    assert cat.materials.kind[0] == KIND_SOLID
    assert cat.materials.kind[1] == KIND_MATTE
    assert cat.edge_thickness[1] == F32(0.25)
