"""Native C++ scene pipeline vs numpy fallback (differential tests)."""

import numpy as np
import pytest

from rust_raytrace_tpu import math3d as m3
from rust_raytrace_tpu import octree
from rust_raytrace_tpu.geometry import make_sphere, make_triangles
from rust_raytrace_tpu.materials import solid
from rust_raytrace_tpu.ops.pages import morton_order
from rust_raytrace_tpu.scene import assemble
from rust_raytrace_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")

F32 = np.float32


@pytest.fixture(scope="module")
def scene():
    s = make_sphere((0.0, 0.0, 6.0), 2.0, (10, 16),
                    solid(m3.make_color((200, 60, 60))), -1.0)
    return assemble([s])


def test_make_triangles_matches_numpy(rng):
    pts = rng.standard_normal((500, 3, 3)).astype(F32) * 3
    nat = native.make_triangles_native(pts)
    assert nat is not None
    incenter, norm, sides, side_lens, r2 = nat
    ref = make_triangles(pts, solid(m3.make_color((1, 1, 1))), 0.0)
    np.testing.assert_allclose(incenter, ref.incenter, rtol=1e-6, atol=1e-6)
    # random triangles include near-degenerate ones whose normal
    # (unit(cross(sides))) amplifies fp noise; 1e-3 still catches real bugs
    np.testing.assert_allclose(norm, ref.norm, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(sides, ref.sides, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(side_lens, ref.side_lens, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(r2, ref.bounding_r2, rtol=1e-5)


def test_morton_order_matches_numpy(scene):
    nat = native.morton_order_native(scene.tris.incenter)
    ref = _numpy_morton(scene.tris)
    np.testing.assert_array_equal(nat, ref)


@pytest.mark.parametrize("page_size", [16, 56])
def test_kd_order_matches_numpy(scene, page_size):
    """The C++ KD ordering is an exact behavioral copy of the numpy
    pages.kd_order fallback (same stable sorts, same f32 SAH cost
    arithmetic, same strict-< first-wins tie rule over (axis, split))."""
    nat = native.kd_order_native(scene.tris.incenter, page_size)
    assert nat is not None
    from rust_raytrace_tpu.ops import pages as P

    # the scene is < 1024 tris, so kd_order always takes the numpy branch
    ref = P.kd_order(scene.tris, page_size)
    np.testing.assert_array_equal(nat, ref)


def _numpy_morton(tris):
    import os

    os.environ["RUST_RAYTRACE_NO_NATIVE"] = "1"
    try:
        from rust_raytrace_tpu.ops import pages

        c = tris.incenter[1:]
        lo = c.min(axis=0)
        span = np.maximum(c.max(axis=0) - lo, 1e-20)
        q = np.minimum((c - lo) / span * 1024.0, 1023.0).astype(np.uint32)
        return np.argsort(pages._morton3(q), kind="stable").astype(np.int64) + 1
    finally:
        del os.environ["RUST_RAYTRACE_NO_NATIVE"]


def _flatten(n, acc):
    acc.append((n.depth, tuple(np.round(n.orig, 5)), round(n.len2, 6),
                tuple(sorted(int(t) for t in n.tri_indices))
                if n.is_leaf else None,
                len(n.children) if n.children else 0))
    if n.children:
        for c in n.children:
            _flatten(c, acc)
    return acc


def test_octree_matches_numpy_shallow(scene):
    """Exact structural equality at shallow depth (away from the marginal
    fp flips the reference's ill-conditioned face predicate produces at
    fine subdivision)."""
    t_nat = octree.build_bounding_box(scene.tris, (0.0, 0.0, 6.0), 8.0,
                                      maxdepth=3, minobjs=10, use_native=True)
    t_np = octree.build_bounding_box(scene.tris, (0.0, 0.0, 6.0), 8.0,
                                     maxdepth=3, minobjs=10, use_native=False)
    a = _flatten(t_nat, [])
    b = _flatten(t_np, [])
    # The reference's face predicate (raytrace.rs:645-729) is numerically
    # ill-conditioned: marginal fp decisions legitimately differ between two
    # f32 implementations and cascade structurally.  Require approximate
    # agreement; exact semantics are covered by the deep test below.
    assert abs(len(a) - len(b)) <= max(2, len(b) // 20), (len(a), len(b))
    common = {x[:3] for x in a} & {x[:3] for x in b}
    assert len(common) >= 0.9 * min(len(a), len(b))


def test_octree_native_semantics_deep(scene):
    """At depth: both trees must cover every triangle and agree on the
    nearest hit for aimed rays (the property renders depend on)."""
    t_nat = octree.build_bounding_box(scene.tris, (0.0, 0.0, 6.0), 8.0,
                                      maxdepth=6, minobjs=8, use_native=True)
    seen = set()
    for leaf in octree.leaves(t_nat):
        seen.update(int(t) for t in leaf.tri_indices)
    assert seen == set(range(1, len(scene.tris)))

    rng = np.random.default_rng(3)
    center = np.asarray([0.0, 0.0, 6.0], dtype=F32)
    from rust_raytrace_tpu import oracle
    for _ in range(20):
        o = rng.normal(size=3).astype(F32) * 0.5
        d = m3.unit((center - o + rng.normal(size=3).astype(F32)).astype(F32))
        brute = oracle.nearest_hit(scene.tris, o, d)
        walk = octree.get_object_intersection_for_ray(t_nat, scene.tris, o, d)
        if brute is None:
            assert walk is None
        else:
            assert walk is not None and walk[1] == brute[1]
