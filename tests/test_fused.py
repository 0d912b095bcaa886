"""Fused trace+shade kernels == their unfused two-kernel compositions.

The fusions (ops/intersect_perlane.trace_shade_perlane_pallas and
ops/intersect_pallas.trace_shade_chunks_pallas) must be pure plumbing: the
same winner rows fed through the same shade algebra.  Fixed-RNG mode must
match BITWISE; live-RNG mode also matches bitwise because both paths derive
scatter vectors from the same counter hash (ops/shade.scatter_rv)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpret-mode kernels: minutes per module

from rust_raytrace_tpu import math3d as m3
from rust_raytrace_tpu.geometry import make_sphere, make_triangles
from rust_raytrace_tpu.materials import matte, reflective, solid
from rust_raytrace_tpu.scene import assemble

F32 = np.float32
RB = 256
R = 2 * RB


@pytest.fixture(scope="module")
def scene():
    s = make_sphere((0.0, 0.0, 6.0), 2.0, (8, 12),
                    matte(m3.make_color((200, 60, 60)), 0.3), -1.0)
    floor = make_triangles(
        np.asarray([[[-20, -3, -10], [20, -3, -10], [0, -3, 40]]], dtype=F32),
        reflective(m3.make_color((120, 120, 120)), 0.8, 0.1), 0.0)
    return assemble([s, floor])


@pytest.fixture(scope="module")
def state_np(scene):
    rng = np.random.default_rng(5)
    tris = scene.tris
    pick = rng.integers(1, len(tris), R)
    o = tris.incenter[pick].T.astype(F32)
    d = rng.normal(size=(3, R)).astype(F32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    alive = (rng.uniform(size=R) > 0.15).astype(F32)
    st = np.zeros((16, R), F32)
    st[0:3] = o + d * 0.01
    st[3:6] = d * alive[None, :]
    st[6] = rng.uniform(0.1, 1.0, R).astype(F32)
    st[7] = alive
    st[8:11] = rng.uniform(0, 0.5, (3, R)).astype(F32)
    return st


@pytest.mark.parametrize("fixed_rng", [True, False])
def test_perlane_fused_equals_composition(scene, state_np, fixed_rng):
    import jax.numpy as jnp

    from rust_raytrace_tpu.ops.intersect_perlane import (
        build_perlane_tables, trace_perlane_pallas,
        trace_shade_perlane_pallas)
    from rust_raytrace_tpu.ops.pages import build_pages_kd
    from rust_raytrace_tpu.ops.shade import shade_pallas

    pages = build_pages_kd(scene.tris, page_size=16)
    plt_i, plt_s, ab = (jnp.asarray(x) for x in build_perlane_tables(pages))
    st = jnp.asarray(state_np)
    seed = jnp.asarray([123, 456], jnp.uint32)

    fused = trace_shade_perlane_pallas(
        st, plt_i, plt_s, ab, seed, 16, RB, fixed_rng=fixed_rng,
        weight_cutoff=1 / 512, interpret=True)

    rows = trace_perlane_pallas(
        st[0:3], st[3:6], st[7] != 0, plt_i, plt_s, ab, 16, RB,
        interpret=True)
    unfused = shade_pallas(st, rows, seed, rb=RB, fixed_rng=fixed_rng,
                           weight_cutoff=1 / 512, interpret=True)

    np.testing.assert_array_equal(np.asarray(fused), np.asarray(unfused))


def test_perlane_dynamic_grid_bit_exact(scene, state_np):
    """grid_live (Mosaic dynamic grid over the survivor prefix) must match
    the static full grid BITWISE: visited chunks compute identically (same
    program ids) and the unvisited tail keeps its input bits via the
    state->output alias — exactly the _skip pass-through's identity."""
    import jax.numpy as jnp

    from rust_raytrace_tpu.ops.intersect_perlane import (
        build_perlane_tables, trace_shade_perlane_pallas)
    from rust_raytrace_tpu.ops.pages import build_pages_kd

    pages = build_pages_kd(scene.tris, page_size=16)
    plt_i, plt_s, ab = (jnp.asarray(x) for x in build_perlane_tables(pages))
    # survivor prefix: chunk 0 live, chunk 1 all gap lanes (zeros), the
    # compacted-state shape the dynamic grid is built for
    st_np = np.array(state_np, copy=True)
    st_np[:, RB:] = 0.0
    st = jnp.asarray(st_np)
    seed = jnp.asarray([123, 456], jnp.uint32)
    chunk_live = jnp.asarray([1, 0], jnp.int32)

    static = trace_shade_perlane_pallas(
        st, plt_i, plt_s, ab, seed, 16, RB, fixed_rng=False,
        weight_cutoff=1 / 512, chunk_live=chunk_live, interpret=True)
    dyn = trace_shade_perlane_pallas(
        st, plt_i, plt_s, ab, seed, 16, RB, fixed_rng=False,
        weight_cutoff=1 / 512, chunk_live=chunk_live,
        grid_live=jnp.int32(1), interpret=True)

    np.testing.assert_array_equal(np.asarray(static), np.asarray(dyn))
    # the unvisited tail chunk is bit-preserved (all zeros here)
    np.testing.assert_array_equal(np.asarray(dyn)[:, RB:], 0.0)


@pytest.mark.parametrize("fixed_rng", [True, False])
def test_union_fused_equals_composition(scene, state_np, fixed_rng):
    import jax.numpy as jnp

    from rust_raytrace_tpu.ops.cull_pallas import cull_mask_exact_pallas
    from rust_raytrace_tpu.ops.intersect_pallas import (
        trace_chunks_pallas, trace_shade_chunks_pallas)
    from rust_raytrace_tpu.ops.pages import build_pages_kd
    from rust_raytrace_tpu.ops.shade import shade_pallas
    from rust_raytrace_tpu.render import upload_scene

    pages = build_pages_kd(scene.tris, page_size=16)
    ts = upload_scene(scene, pages=pages)
    st = jnp.asarray(state_np)
    seed = jnp.asarray([9, 77], jnp.uint32)

    mask, tmin = cull_mask_exact_pallas(
        st[0:3], st[3:6], st[7] != 0, jnp.asarray(pages.aabb_lo),
        jnp.asarray(pages.aabb_hi), RB, interpret=True)
    counts = jnp.sum(mask, axis=1, dtype=jnp.int32)
    plist = jnp.argsort(tmin, axis=1, stable=True).astype(jnp.int32)
    ptmin = jnp.take_along_axis(tmin, plist, axis=1)

    fused = trace_shade_chunks_pallas(
        st, ts.PK, counts, plist, ptmin, seed, 16, RB,
        fixed_rng=fixed_rng, weight_cutoff=1 / 512, interpret=True)

    rows = trace_chunks_pallas(st[0:3], st[3:6], ts.PK, counts, plist,
                               ptmin, 16, RB, interpret=True)
    unfused = shade_pallas(st, rows, seed, rb=RB, fixed_rng=fixed_rng,
                           weight_cutoff=1 / 512, interpret=True)

    np.testing.assert_array_equal(np.asarray(fused), np.asarray(unfused))
