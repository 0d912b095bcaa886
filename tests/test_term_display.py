"""Terminal display — the headless analog of the reference's SDL results
window (raytrace/src/main.rs:229-270): final framebuffer blitted as ANSI
truecolor half-blocks, colors matching the PNG's exact `(c*255) as u8` bytes.
"""

import io

import numpy as np

from rust_raytrace_tpu.utils.term_display import (
    display_image, downsample_u8, to_ansi)


def test_to_ansi_exact_cells():
    # 2x2 image -> one text row, two half-block cells; fg = top row pixel,
    # bg = bottom row pixel, 24-bit SGR codes, trailing reset
    img = np.array([[[255, 0, 0], [0, 255, 0]],
                    [[0, 0, 255], [10, 20, 30]]], dtype=np.uint8)
    s = to_ansi(img)
    assert s == ("\x1b[38;2;255;0;0m\x1b[48;2;0;0;255m▀"
                 "\x1b[38;2;0;255;0m\x1b[48;2;10;20;30m▀"
                 "\x1b[0m\n")


def test_to_ansi_quantizes_like_png():
    # float input goes through the PNG writer's trunc/saturate/NaN->0 cast
    img = np.array([[[0.5, 1.5, float("nan")]],
                    [[-1.0, 0.999, 0.0]]], dtype=np.float32)
    s = to_ansi(img)
    assert "\x1b[38;2;127;255;0m" in s      # trunc(0.5*255)=127, sat, NaN->0
    assert "\x1b[48;2;0;254;0m" in s        # sat low, trunc(0.999*255)=254


def test_to_ansi_odd_height_pads_black():
    img = np.full((1, 1, 3), 200, dtype=np.uint8)
    s = to_ansi(img)
    assert "\x1b[48;2;0;0;0m" in s          # bottom half padded black


def test_downsample_box_filter_mean():
    # 4x4 -> 2x2 averages each 2x2 block exactly
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[:2, :2] = 100
    img[:2, 2:] = 200
    img[2:, :2] = 40
    img[2:, 2:] = [8, 16, 24]
    out = downsample_u8(img, 2, 2)
    assert out.shape == (2, 2, 3)
    assert (out[0, 0] == 100).all() and (out[0, 1] == 200).all()
    assert (out[1, 0] == 40).all() and tuple(out[1, 1]) == (8, 16, 24)


def test_downsample_never_upscales():
    img = np.zeros((3, 5, 3), dtype=np.uint8)
    assert downsample_u8(img, 100, 100).shape == (3, 5, 3)


def test_to_ansi_bounds_output_size():
    img = np.zeros((64, 64, 3), dtype=np.uint8)
    s = to_ansi(img, max_cols=8, max_rows=4)
    lines = s.rstrip("\n").split("\n")
    assert len(lines) <= 4
    assert lines[0].count("▀") <= 8


def test_display_image_writes_frame():
    buf = io.StringIO()  # not a real fd -> falls back to default size
    display_image(np.zeros((4, 4, 3), dtype=np.uint8), out=buf)
    text = buf.getvalue()
    assert text.startswith("-- Results --\n")
    assert text.count("▀") == 8  # 4x4 -> 2 rows of 4 cells


def test_cli_view_flag(tmp_path, capsys):
    from rust_raytrace_tpu.cli import main

    rc = main(["render", "--scene", "circles", "--resolution", "16x16",
               "--backend", "oracle", "--maxdepth", "1",
               "--out", str(tmp_path / "t.png"), "--view"])
    assert rc == 0
    assert "▀" in capsys.readouterr().out
