"""Golden-image regression tests.

tests/goldens/*.png are deterministic fixed-rng oracle renders committed to
the repo (the analog of the reference's checked-in golden PNGs — which its
own shipped scenes can't reproduce bit-exactly because its shading consumes
thread-local RNG; ours can, because the RNG is injectable).

The wavefront backends must reproduce them through the full pipeline
including PNG quantization.
"""

import os

import numpy as np
import pytest

from rust_raytrace_tpu import oracle
from rust_raytrace_tpu.engine import Engine
from rust_raytrace_tpu.models import circles, multi, teapot
from rust_raytrace_tpu.render import WavefrontRenderer
from rust_raytrace_tpu.utils import png

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


def _check(scene, vp, golden_name, tol_frac=0.005):
    golden = png.read_png(os.path.join(GOLDENS, golden_name))

    simple = WavefrontRenderer(scene, backend="xla", page_size=128,
                               ray_chunk=512)
    img_s = png.quantize_u8(simple.render(vp, fixed_rng=True).image)
    diff_s = (np.abs(img_s.astype(int) - golden.astype(int)).max(axis=-1) > 1)
    assert diff_s.mean() <= tol_frac, f"simple vs {golden_name}"

    eng = Engine(scene, page_size=128, ray_chunk=512, interpret=True)
    img_e = eng.render(vp, fixed_rng=True).image
    diff_e = (np.abs(img_e.astype(int) - golden.astype(int)).max(axis=-1) > 1)
    assert diff_e.mean() <= tol_frac, f"engine vs {golden_name}"


def test_circles_golden():
    scene, vp = circles.build(resolution=(96, 54), maxdepth=5)
    _check(scene, vp, "circles_96x54.png")


@pytest.mark.needs_teapot
def test_teapot_golden():
    scene, vp = teapot.build(resolution=(96, 54), maxdepth=5)
    _check(scene, vp, "teapot_96x54.png")


def test_multi_golden():
    scene, vp = multi.build(resolution=(64, 36), maxdepth=4)
    _check(scene, vp, "multi_64x36.png")


def test_goldens_regenerate_exactly():
    """The committed golden is byte-identical to a fresh oracle render
    (guards both the oracle and the PNG quantization against drift)."""
    scene, vp = circles.build(resolution=(96, 54), maxdepth=5)
    img = oracle.render(scene.tris, vp, rng=oracle.FixedRng())
    golden = png.read_png(os.path.join(GOLDENS, "circles_96x54.png"))
    np.testing.assert_array_equal(png.quantize_u8(img), golden)
