"""PNG quantization tests (raytrace.rs:1460-1478 `(c*255.) as u8` semantics)."""

import numpy as np

from rust_raytrace_tpu.utils.png import quantize_u8, read_png, rmse, write_png


def test_quantize_truncates():
    img = np.asarray([[[0.0, 0.5, 1.0]]], dtype=np.float32)
    q = quantize_u8(img)
    # 0.5*255 = 127.5 -> truncates to 127 (Rust `as u8` rounds toward zero)
    assert list(q[0, 0]) == [0, 127, 255]


def test_quantize_saturates_and_nan():
    img = np.asarray([[[-0.5, 2.0, np.nan]]], dtype=np.float32)
    q = quantize_u8(img)
    assert list(q[0, 0]) == [0, 255, 0]


def test_quantize_matches_rust_cast_grid():
    # Rust `as u8`: trunc toward zero with saturation, across the whole range
    vals = np.linspace(-0.1, 1.1, 1000).astype(np.float32)
    q = quantize_u8(vals.reshape(-1, 1, 1))
    expect = np.clip(np.trunc(vals.astype(np.float64) * 255), 0, 255)
    np.testing.assert_array_equal(q.reshape(-1), expect.astype(np.uint8))


def test_write_read_roundtrip(tmp_path):
    img = np.random.default_rng(0).random((7, 5, 3)).astype(np.float32)
    p = str(tmp_path / "t.png")
    write_png(p, img)
    back = read_png(p)
    np.testing.assert_array_equal(back, quantize_u8(img))


def test_rmse():
    a = np.zeros((4, 4, 3), dtype=np.float32)
    b = np.full((4, 4, 3), 0.1, dtype=np.float32)
    assert abs(rmse(a, b) - 0.1) < 1e-7
    assert rmse(a, a) == 0.0
    # u8 inputs are scaled to [0,1]
    au8 = np.zeros((2, 2, 3), dtype=np.uint8)
    bu8 = np.full((2, 2, 3), 255, dtype=np.uint8)
    assert abs(rmse(au8, bu8) - 1.0) < 1e-9
