"""Octree tests (reference raytrace.rs:612-1101 + its one unit test)."""

import numpy as np
import pytest

from rust_raytrace_tpu import math3d as m3
from rust_raytrace_tpu import octree, oracle
from rust_raytrace_tpu.geometry import make_sphere, make_triangles
from rust_raytrace_tpu.materials import solid
from rust_raytrace_tpu.scene import assemble

F32 = np.float32


@pytest.fixture(scope="module")
def sphere_scene():
    s = make_sphere((0.0, 0.0, 6.0), 2.0, (8, 12),
                    solid(m3.make_color((200, 60, 60))), -1.0)
    return assemble([s])


@pytest.fixture(scope="module")
def tree(sphere_scene):
    return octree.build_bounding_box(sphere_scene.tris, (0.0, 0.0, 6.0),
                                     8.0, maxdepth=6, minobjs=8)


def test_face_collision_reference_case():
    """The reference's only geometry unit test (raytrace.rs:731-751)."""
    tris = make_triangles(
        np.asarray([[[1.0, 0.4, 0.2], [1.0, 0.2, -0.3], [0.6, 0.6, -0.5]]],
                   dtype=F32),
        solid(m3.make_color((0, 0, 0))), 0.0)
    hit = octree._face_contains_triangles(
        np.asarray([2.0, 2.0, 2.0], dtype=F32),
        np.asarray([0.0, 0.0, -1.0], dtype=F32), 2.0, tris,
        np.asarray([0]))
    assert bool(hit[0])


def test_every_triangle_lands_in_a_leaf(sphere_scene, tree):
    seen = set()
    for leaf in octree.leaves(tree):
        seen.update(int(t) for t in leaf.tri_indices)
    # every non-sentinel triangle inside the root box appears somewhere
    assert seen == set(range(1, len(sphere_scene.tris)))


def test_leaf_size_and_depth_limits(tree):
    for leaf in octree.leaves(tree):
        assert leaf.depth <= 6
        # leaves above maxdepth obey minobjs (can exceed only at maxdepth)
        if leaf.depth < 6:
            assert leaf.tri_indices.shape[0] < 8 or leaf.depth == 0


def test_collides_slab(tree):
    # straight-on hit through the middle
    hit = octree.collides(tree, (0.0, 0.0, 0.0), (0.0, 0.0, 1.0))
    assert hit is not None
    tmin, tmax = hit
    assert tmin < tmax
    assert abs(tmin - (-2.0)) < 1e-4     # box spans z in [-2, 14]
    # reference quirk preserved: axes with d == 0 are skipped entirely
    # (raytrace.rs:872-900), so even a laterally-outside parallel ray "hits"
    assert octree.collides(tree, (100.0, 0.0, 0.0), (0.0, 0.0, 1.0)) is not None
    # clean miss with all components active
    assert octree.collides(tree, (100.0, 0.0, 6.0),
                           m3.unit(m3.vec(1.0, 0.3, 0.3))) is None


def test_get_all_objects_sorted(sphere_scene, tree):
    objs = octree.get_all_objects_for_ray(tree, (0.0, 0.0, 0.0),
                                          (0.0, 0.0, 1.0))
    keys = list(objs)
    assert keys == sorted(keys)
    union = set()
    for v in objs.values():
        union.update(int(t) for t in v)
    # the union of visited leaves must contain the brute-force hit
    hit = oracle.nearest_hit(sphere_scene.tris, np.zeros(3, dtype=F32),
                             np.asarray([0, 0, 1], dtype=F32))
    assert hit is not None and hit[1] in union


def test_walk_matches_bruteforce(sphere_scene, tree):
    rng = np.random.default_rng(7)
    matched = 0
    center = np.asarray([0.0, 0.0, 6.0], dtype=F32)
    for _ in range(40):
        o = rng.normal(size=3).astype(F32) * 0.5
        # aim at the sphere with some scatter so both hits and misses occur
        d = m3.unit((center - o + rng.normal(size=3).astype(F32)
                     * 1.5).astype(F32))
        brute = oracle.nearest_hit(sphere_scene.tris, o, d)
        walk = octree.get_object_intersection_for_ray(tree, sphere_scene.tris,
                                                      o, d)
        if brute is None:
            assert walk is None
        else:
            assert walk is not None
            assert walk[1] == brute[1]
            assert abs(walk[0] - brute[0]) < 1e-4
            matched += 1
    assert matched > 5   # enough hits for the test to be meaningful


def test_trivial_and_empty_boxes(sphere_scene):
    triv = octree.build_trivial_bounding_box(sphere_scene.tris,
                                             (0.0, 0.0, 6.0), 8.0)
    assert triv.is_leaf
    assert triv.tri_indices.shape[0] == len(sphere_scene.tris) - 1
    empty = octree.build_empty_box()
    assert empty.is_leaf and empty.tri_indices.shape[0] == 0


def test_octree_page_order_unique_and_complete(sphere_scene):
    order = octree.octree_page_order(sphere_scene.tris, (0.0, 0.0, 6.0), 8.0,
                                     maxdepth=6, minobjs=8)
    assert sorted(order.tolist()) == list(range(1, len(sphere_scene.tris)))


def test_print_tree_runs(tree):
    lines = []
    octree.print_tree(tree, out=lines.append)
    assert lines and lines[0].startswith("Bx: 0")
