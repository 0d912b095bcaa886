"""Streamed-bank traversal (ops/intersect_streamed.py) — the unbounded-
scene regime that replaced the round-3 union-kernel fallback.

The contract: the streamed kernel is BIT-EXACT equal to the resident
banked per-lane kernel (and therefore to the union kernel and the oracle,
through the existing chains) on every surface THIS module pins — nearest
hit, any_hit occlusion with exclusion, the fused trace+shade state
update, chunk skipping, and full engine renders including lights and
primary debug buffers.  The regime's OTHER differential surfaces live
where their siblings do: the sharded path in
tests/test_sharding.py::test_render_sharded_streamed_bitexact, the
random-geometry campaign in
tests/test_fuzz.py::test_random_streamed_scene, and the multi-chip dryrun
leg in __graft_entry__.dryrun_multichip.
The scene here is small but spans 4 BANKS at page_size 8, so the bank
worklist, the cross-bank front-to-back cut, and the per-bank payload
extraction-overwrite all exercise for real (a scene this size would never
stream in production — Engine(streamed=True) forces the regime, the same
code path a >262k-triangle scene selects automatically).

Reference: the scale-free octree traversal this regime matches,
raytrace.rs:790-845 (depth <= 10 at any triangle count).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpret-mode kernels: minutes per module

from rust_raytrace_tpu import math3d as m3
from rust_raytrace_tpu.camera import create_viewport
from rust_raytrace_tpu.engine import Engine
from rust_raytrace_tpu.geometry import make_sphere
from rust_raytrace_tpu.materials import matte
from rust_raytrace_tpu.scene import assemble

F32 = jnp.float32
P = 8
RB = 128


def eq_bits(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return ((a == b) | (np.isnan(a) & np.isnan(b))).all()


@pytest.fixture(scope="module")
def sphere_scene():
    s = make_sphere((0.0, 0.0, 6.0), 2.5, (40, 40),
                    matte(m3.make_color((252, 119, 0)), 0.2), 0.0)
    return assemble([s])


@pytest.fixture(scope="module")
def tables(sphere_scene):
    from rust_raytrace_tpu.ops.intersect_perlane import build_perlane_tables
    from rust_raytrace_tpu.ops.intersect_streamed import \
        build_streamed_tables
    from rust_raytrace_tpu.ops.pages import build_pages_kd

    pages = build_pages_kd(sphere_scene.tris, page_size=P)
    assert -(-pages.num_pages // 128) >= 3, "need a multi-bank scene"
    res = tuple(map(jnp.asarray, build_perlane_tables(pages)))
    stm = tuple(map(jnp.asarray, build_streamed_tables(pages)))
    return res, stm


@pytest.fixture(scope="module")
def rays():
    rng = np.random.default_rng(7)
    R = 256
    o = rng.normal(size=(3, R)).astype(np.float32) * 0.5
    d = rng.normal(size=(3, R)).astype(np.float32)
    d = d * 0.6 + np.array([[0.0], [0.0], [1.0]], np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    alive = (rng.random(R) > 0.1).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d), jnp.asarray(alive)


def test_streamed_nearest_bitexact(tables, rays):
    from rust_raytrace_tpu.ops.intersect_perlane import trace_perlane_pallas
    from rust_raytrace_tpu.ops.intersect_streamed import \
        trace_streamed_pallas

    (plt_i, plt_s, ab), (si, ss, sab, sbab) = tables
    o, d, alive = rays
    ref = trace_perlane_pallas(o, d, alive, plt_i, plt_s, ab, P, RB,
                               interpret=True)
    got = trace_streamed_pallas(o, d, alive, si, ss, sab, sbab, P, RB,
                                interpret=True)
    assert eq_bits(ref, got)
    # the surface is real: hits and misses both present
    ids = np.asarray(got)[1]
    assert (ids != 0).any() and (ids == 0).any()


def test_streamed_any_hit_exclusion(tables, rays):
    """Occlusion mode (shadow feelers): the per-lane occlusion BIT must
    match; the origin triangle is excluded per lane
    (raytrace.rs:1204-1224)."""
    from rust_raytrace_tpu.ops.intersect_perlane import trace_perlane_pallas
    from rust_raytrace_tpu.ops.intersect_streamed import \
        trace_streamed_pallas

    (plt_i, plt_s, ab), (si, ss, sab, sbab) = tables
    o, d, alive = rays
    hid = np.asarray(trace_perlane_pallas(o, d, alive, plt_i, plt_s, ab, P,
                                          RB, interpret=True))[1]
    excl = jnp.asarray(hid[None, :])
    ref = trace_perlane_pallas(o, d, alive, plt_i, plt_s, ab, P, RB,
                               interpret=True, excl=excl, any_hit=True)
    got = trace_streamed_pallas(o, d, alive, si, ss, sab, sbab, P, RB,
                                interpret=True, excl=excl, any_hit=True)
    assert ((np.asarray(ref)[1] != 0) == (np.asarray(got)[1] != 0)).all()


@pytest.mark.parametrize("fixed", [True, False])
def test_streamed_fused_shade_bitexact(tables, rays, fixed):
    from rust_raytrace_tpu.ops.compact import STATE_ROWS
    from rust_raytrace_tpu.ops.intersect_perlane import \
        trace_shade_perlane_pallas
    from rust_raytrace_tpu.ops.intersect_streamed import \
        trace_shade_streamed_pallas

    (plt_i, plt_s, ab), (si, ss, sab, sbab) = tables
    o, d, alive = rays
    R = o.shape[1]
    arow = alive[None, :]
    state = jnp.concatenate(
        [o, d, arow, arow, jnp.zeros((STATE_ROWS - 8, R), F32)], axis=0)
    seed = jnp.asarray([123, 456], jnp.uint32)
    ref = trace_shade_perlane_pallas(state, plt_i, plt_s, ab, seed, P, RB,
                                     fixed_rng=fixed, weight_cutoff=0.0,
                                     interpret=True)
    got = trace_shade_streamed_pallas(state, si, ss, sab, sbab, seed, P, RB,
                                      fixed_rng=fixed, weight_cutoff=0.0,
                                      interpret=True)
    assert eq_bits(ref, got)
    # chunk skipping: retired chunks pass through untouched
    cl = jnp.asarray([1, 0], jnp.int32)
    refC = trace_shade_perlane_pallas(state, plt_i, plt_s, ab, seed, P, RB,
                                      fixed_rng=fixed, weight_cutoff=0.0,
                                      interpret=True, chunk_live=cl)
    gotC = trace_shade_streamed_pallas(state, si, ss, sab, sbab, seed, P,
                                       RB, fixed_rng=fixed,
                                       weight_cutoff=0.0, interpret=True,
                                       chunk_live=cl)
    assert eq_bits(refC, gotC)


@pytest.mark.parametrize("fixed", [True, False])
def test_bankmajor_equals_worklist_bitexact(tables, rays, fixed):
    """The round-5 BANK-MAJOR bounce sweep (one table DMA per bank per
    wave, trace_shade_bankmajor_pallas) == the per-chunk bank-worklist
    kernel bitwise on the full fused surface, including chunk skipping
    and the survivor-prefix dynamic grid.  Winner selection is a
    lexicographic (t, id) min with exact pruning only, so it is
    visit-order independent — this pins the claim."""
    from rust_raytrace_tpu.ops.compact import STATE_ROWS
    from rust_raytrace_tpu.ops.intersect_streamed import (
        trace_shade_bankmajor_pallas, trace_shade_streamed_pallas)

    _, (si, ss, sab, sbab) = tables
    o, d, alive = rays
    R = o.shape[1]
    arow = alive[None, :]
    state = jnp.concatenate(
        [o, d, arow, arow, jnp.zeros((STATE_ROWS - 8, R), F32)], axis=0)
    seed = jnp.asarray([123, 456], jnp.uint32)
    for cl, gl in ((None, None),
                   (jnp.asarray([1, 0], jnp.int32), None),
                   (jnp.asarray([1, 1], jnp.int32), jnp.int32(1))):
        kw = dict(fixed_rng=fixed, weight_cutoff=1 / 512, chunk_live=cl,
                  interpret=True, grid_live=gl)
        ref = trace_shade_streamed_pallas(state, si, ss, sab, sbab, seed,
                                          P, RB, **kw)
        got = trace_shade_bankmajor_pallas(state, si, ss, sab, sbab, seed,
                                           P, RB, **kw)
        n = R if gl is None else int(gl) * RB
        assert eq_bits(np.asarray(ref)[:, :n], np.asarray(got)[:, :n]), \
            (cl, gl)


def test_engine_streamed_render_bitexact(sphere_scene):
    """Full production render through the streamed regime == the banked
    engine bitwise, including the primary-hit debug buffers and wave
    counts (the engine selects this regime automatically past the table
    budget; streamed=True forces it on a test-size scene)."""
    vp = create_viewport((48, 32), (1.0, 32 / 48), (0.0, 0.0, 0.0),
                         m3.unit(m3.vec(0.0, 0.0, 1.0)), 90.0, 0.0, 4, 1)
    ref = Engine(sphere_scene, page_size=P, ray_chunk=256, interpret=True,
                 auto_pages=False)
    stm = Engine(sphere_scene, page_size=P, ray_chunk=256, interpret=True,
                 auto_pages=False, streamed=True)
    assert ref.plt_i is not None and not ref.streamed
    assert stm.streamed and stm.slt_i is not None and stm.plt_i is None
    r1 = ref.render(vp, fixed_rng=True, quantize=False, debug=True)
    r2 = stm.render(vp, fixed_rng=True, quantize=False, debug=True)
    np.testing.assert_array_equal(r1.image, r2.image)
    np.testing.assert_array_equal(r1.primary_id, r2.primary_id)
    assert eq_bits(r1.primary_t, r2.primary_t)
    np.testing.assert_array_equal(r1.wave_rays, r2.wave_rays)
    assert (r1.primary_id != 0).any()


def test_engine_streamed_lights_bitexact(sphere_scene):
    """Lights scenes in the streamed regime ride the unfused rows path +
    streamed any_hit shadow feelers — bit-exact vs the banked engine."""
    from dataclasses import replace

    from rust_raytrace_tpu.scene import LightSource

    lit = replace(sphere_scene,
                  lights=LightSource(orig=np.asarray([0.0, 8.0, 0.0],
                                                     np.float32),
                                     len2=np.float32(0.5)))
    vp = create_viewport((32, 24), (1.0, 24 / 32), (0.0, 0.0, 0.0),
                         m3.unit(m3.vec(0.0, 0.0, 1.0)), 90.0, 0.0, 3, 1)
    ref = Engine(lit, page_size=P, ray_chunk=128, interpret=True,
                 auto_pages=False)
    stm = Engine(lit, page_size=P, ray_chunk=128, interpret=True,
                 auto_pages=False, streamed=True)
    r1 = ref.render(vp, fixed_rng=True, quantize=False)
    r2 = stm.render(vp, fixed_rng=True, quantize=False)
    np.testing.assert_array_equal(r1.image, r2.image)
