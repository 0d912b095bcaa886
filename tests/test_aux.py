"""Auxiliary subsystems: progress stats, ray debug differ, CLI."""

import io

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpret-mode kernels: minutes per module

from rust_raytrace_tpu.utils.progress import ProgressStat, create_ctx
from rust_raytrace_tpu.utils.raydebug import DebugCtx


def test_progress_stats_report():
    ctx = create_ctx(4, 4, enable_io=False)
    ctx.update(8, {"Rays": 100, "Render": 0.5},
               kinds={"Rays": "count", "Render": "time"})
    ctx.update(8, {"Rays": 50}, kinds={"Rays": "count"})
    ctx.finish()
    assert ctx.total_rays == 150
    assert ctx.finished_pixels == 16
    lines = []
    ctx.print_stats(out=lines.append)
    assert "million rays" in lines[0]
    assert any(l.startswith("Render:") for l in lines)
    assert any(l.startswith("Rays: 150") for l in lines)


def test_debug_ctx_roundtrip_and_compare():
    a = DebugCtx()
    b = DebugCtx()
    o = np.asarray([1.0, 2.0, 3.0])
    d = np.asarray([0.0, 0.0, 1.0])
    for ctx in (a, b):
        ctx.register_ray(o, (0, 0))
        ctx.add_ray(o, d)
        ctx.update_ray_triangles(o, [5, 3, 5])
    a.update_ray_hit(o, 3, 1.5)
    b.update_ray_hit(o, 3, 1.5)

    out = io.StringIO()
    a.write_debug_header(out)
    a.write_all_debug_context(out)
    text = out.getvalue()
    assert text.startswith("Pixel_x;Pixel_y;ray_p;ray_v;tri_hit;hit_t")
    assert "3,5" in text  # deduped sorted candidate list

    diff = io.StringIO()
    assert a.compare_to(b, diff) == 0

    # hit mismatch classified: b's hit is in a's candidate list
    b.update_ray_hit(o, 5, 1.5)
    diff = io.StringIO()
    assert a.compare_to(b, diff) == 1
    assert "Bad hit detection" in diff.getvalue()

    # a's hit NOT in b's candidates -> "their tri list does not contain"
    # (classification per debug.rs:194-204)
    c = DebugCtx()
    c.register_ray(o, (0, 0))
    c.add_ray(o, d)
    c.update_ray_triangles(o, [99])
    c.update_ray_hit(o, 99, 1.5)
    diff = io.StringIO()
    a.compare_to(c, diff)
    assert "does not contain our hit" in diff.getvalue()


def test_cli_render_oracle(tmp_path):
    from rust_raytrace_tpu.cli import main

    out = str(tmp_path / "t.png")
    rc = main(["render", "--scene", "circles", "--resolution", "16x16",
               "--backend", "oracle", "--maxdepth", "2", "--out", out,
               "--stats"])
    assert rc == 0
    from rust_raytrace_tpu.utils.png import read_png

    img = read_png(out)
    assert img.shape == (16, 16, 3)


def test_cli_debug_csv(tmp_path):
    from rust_raytrace_tpu.cli import main

    csv = str(tmp_path / "d.csv")
    rc = main(["render", "--scene", "circles", "--resolution", "16x16",
               "--backend", "xla", "--maxdepth", "1", "--out",
               str(tmp_path / "t.png"), "--debug-csv", csv])
    assert rc == 0
    text = open(csv).read()
    assert text.startswith("Pixel_x;Pixel_y")
    assert len(text.splitlines()) == 1 + 16 * 16


def test_depth_indented_trace_logging(caplog):
    """RUST_LOG analog: per-ray + per-box depth-indented tracing
    (raytrace.rs:912-918, 954-958, 1027, 1259)."""
    import logging

    import numpy as np

    from rust_raytrace_tpu import math3d as m3
    from rust_raytrace_tpu import oracle
    from rust_raytrace_tpu.geometry import make_sphere
    from rust_raytrace_tpu.materials import matte
    from rust_raytrace_tpu.octree import (build_bounding_box,
                                          get_object_intersection_for_ray)
    from rust_raytrace_tpu.scene import assemble

    scene = assemble([make_sphere((0.0, 0.0, 6.0), 2.0, (6, 8),
                                  matte(m3.make_color((250, 0, 0)), 0.2),
                                  0.05)])
    tree = build_bounding_box(scene.tris, (0.0, 0.0, 6.0), 6.0, 3, 6)
    with caplog.at_level(logging.DEBUG, logger="rust_raytrace_tpu.trace"):
        oracle.project_ray(scene.tris, np.zeros(3, np.float32),
                           np.asarray([0, 0, 1], np.float32), 1,
                           oracle.FixedRng())
        get_object_intersection_for_ray(
            tree, scene.tris, np.zeros(3, np.float32),
            np.asarray([0, 0, 1], np.float32))
    text = caplog.text
    assert "Ray: orig=" in text
    assert "Bounding box: " in text
    # depth indentation present: a depth>=1 node line starts with a space
    assert any(r.msg.startswith("%sBounding box") and r.args[0] == " "
               for r in caplog.records) or " Bounding box:" in text


def test_engine_compaction_defaults():
    """Default = static nc=2 start + autotuned per-boundary schedule from
    the first TPU render's wave decay (probe_r5b/r6b/r6c — docs/PERF.md);
    explicit ncompact (int or tuple) disables autotuning; gate_frac stays
    an opt-in."""
    from rust_raytrace_tpu.engine import Engine
    from rust_raytrace_tpu.models import circles, multi

    s, _ = circles.build(resolution=(16, 16))
    e = Engine(s, interpret=True)
    assert e.ncompact == 2 and e._auto_schedule and e.gate_frac is None
    s, _ = multi.build(resolution=(16, 16))
    e = Engine(s, interpret=True, ncompact=2)
    assert e.ncompact == 2 and not e._auto_schedule
    e = Engine(s, interpret=True, ncompact=(True, False, False, True))
    assert e.ncompact == (True, False, False, True)
    e = Engine(s, interpret=True, ncompact=-1, gate_frac=0.5)
    assert e.ncompact == -1 and e.gate_frac == 0.5


def test_plan_boundaries():
    """The schedule planner reproduces each measured chip optimum from its
    measured wave decay (probe_r5b/r6b/r6c — docs/PERF.md)."""
    from rust_raytrace_tpu.engine import plan_boundaries

    teapot = [3686400, 1243347, 599855, 465224, 119892]
    assert plan_boundaries(teapot) == (True, True, False, False)
    synth = [3686400, 818202, 409689, 409250, 0]
    assert plan_boundaries(synth) == (True, True, False, False)
    multi = [3686400, 2347176, 1089194, 730833, 251638]
    assert plan_boundaries(multi) == (True, True, False, False)
    # a scene with strong mid decay keeps its third boundary
    assert plan_boundaries([100, 30, 10, 3, 2]) == \
        (True, True, True, False)
    # degenerate: everything dies after wave 0 (the per-wave chunk-flag
    # refresh makes the dead last wave ~free without a boundary)
    assert plan_boundaries([100, 0, 0]) == (True, False)


def test_compact_meta_self_gating():
    """compact_meta's gate_frac skip trigger: survivors above the ratio of
    the current prefix mark the boundary M_IDENT (in-kernel identity);
    below it the boundary compacts and harvests normally."""
    import jax.numpy as jnp

    from rust_raytrace_tpu.ops.compact import M_IDENT, compact_meta

    R, cb = 1024, 256
    alive = (jnp.arange(R) < 600).astype(jnp.float32)      # 640 padded
    dead = jnp.zeros(R)
    # no gate: only the >R overflow can skip
    meta, total_a, skip, _ = compact_meta(alive, dead, cb, jnp.int32(0), R)
    assert int(total_a) == 640 and not bool(skip)
    # gate vs full-R prefix: 640 > 0.5*1024 -> skip
    meta, _, skip, _ = compact_meta(alive, dead, cb, jnp.int32(0), R,
                                    prefix=None, gate_frac=0.5)
    assert bool(skip) and int(meta[0, M_IDENT]) == 1
    # same survivors vs a 1024 prefix at frac 0.7: 640 <= 716 -> compact
    meta, _, skip, _ = compact_meta(alive, dead, cb, jnp.int32(0), R,
                                    prefix=jnp.int32(1024), gate_frac=0.7)
    assert not bool(skip) and int(meta[0, M_IDENT]) == 0
    # shrunken prefix 768 at frac 0.7: 640 > 537 -> skip
    meta, _, skip, _ = compact_meta(alive, dead, cb, jnp.int32(0), R,
                                    prefix=jnp.int32(768), gate_frac=0.7)
    assert bool(skip)


def test_auto_page_size():
    """Scene-adaptive page size: P=56 up to 8 banks; many-bank scenes grow
    the page to fit ~7 banks (chip sweep on a 99.9k-tri sphere: P=112/7
    banks beat P=56/14 banks 334.9 vs 399 ms — probe_r4g/h); beyond
    MAX_BANKS*128 pages growth is forced for addressability."""
    from rust_raytrace_tpu.engine import auto_page_size
    from rust_raytrace_tpu.ops.intersect_perlane import GROUP, MAX_BANKS

    assert auto_page_size(6720) == 56          # teapot: 1 bank
    assert auto_page_size(19912) == 56         # multi: 3 banks — unchanged
    assert auto_page_size(99905) == 112        # measured optimum exactly
    for n in (2069, 6720, 19912, 59905, 99905, 131000, 500000):
        p = auto_page_size(n)
        assert p % 8 == 0
        assert -(-n // p) <= MAX_BANKS * GROUP
        if -(-(-(-n // 56)) // GROUP) > 8:     # large-scene branch
            assert -(-(-(-n // p)) // GROUP) <= 7
