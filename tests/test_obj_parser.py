"""OBJ loader tests (reference obj_parser.rs:20-73)."""

import numpy as np
import pytest

from rust_raytrace_tpu import math3d as m3
from rust_raytrace_tpu.camera import create_transform
from rust_raytrace_tpu.materials import KIND_MATTE, matte
from rust_raytrace_tpu.obj_parser import parse_mtl, parse_obj, parse_obj_with_mtl
from rust_raytrace_tpu.scene import reference_asset

F32 = np.float32

SIMPLE_OBJ = """\
# comment
v 0.0 0.0 0.0
v 1.0 0.0 0.0
v 0.0 1.0 0.0
v 0.0 0.0 1.0
vn 0 0 1
vt 0.5 0.5
f 1 2 3
f 1/1/1 2/2/1 4/1/1
"""

IDENT = (m3.vec(1, 0, 0), m3.vec(0, 1, 0), m3.vec(0, 0, 1))


def write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_parse_simple(tmp_path):
    path = write(tmp_path, "t.obj", SIMPLE_OBJ)
    tris = parse_obj(path, offset=(0, 0, 0), scale=1.0, transform=IDENT,
                     surface=matte(m3.make_color((10, 10, 10)), 0.2),
                     edge_thickness=0.05)
    assert len(tris) == 2
    np.testing.assert_allclose(tris.corners[0],
                               [[0, 0, 0], [1, 0, 0], [0, 1, 0]], atol=1e-7)
    # slash syntax takes only the position index (obj_parser.rs:32)
    np.testing.assert_allclose(tris.corners[1],
                               [[0, 0, 0], [1, 0, 0], [0, 0, 1]], atol=1e-7)
    assert (tris.materials.kind == KIND_MATTE).all()


def test_vertex_transform_order(tmp_path):
    # v*scale -> change_basis -> +offset (obj_parser.rs:64-66)
    path = write(tmp_path, "t.obj", "v 1 0 0\nv 0 1 0\nv 0 0 1\nf 1 2 3\n")
    rot = create_transform(m3.unit(m3.vec(0.0, 0.3, 1.0)), np.radians(F32(270)))
    offset = np.asarray([1.0, 2.0, 3.0], dtype=F32)
    tris = parse_obj(path, offset=offset, scale=2.0, transform=rot,
                     surface=matte(m3.make_color((1, 1, 1)), 0.2),
                     edge_thickness=0.0)
    for i, v in enumerate(np.eye(3, dtype=F32)):
        expect = m3.change_basis(v * F32(2.0), rot) + offset
        np.testing.assert_allclose(tris.corners[0, i], expect, rtol=1e-5)


@pytest.mark.needs_teapot
def test_teapot_mesh_shape():
    path = reference_asset("raytrace", "teapot_tri.obj")
    tris = parse_obj(path, offset=(0.0, 0.5, 5.0), scale=1.0,
                     transform=create_transform(m3.unit(m3.vec(0.0, 0.3, 1.0)),
                                                np.radians(F32(270))),
                     surface=matte(m3.make_color((252, 119, 0)), 0.2),
                     edge_thickness=0.05)
    assert len(tris) == 6320  # `grep -c '^f '` on teapot_tri.obj
    assert np.isfinite(tris.incenter).all()
    assert np.isfinite(tris.norm).all()
    # unit normals
    np.testing.assert_allclose(m3.length(tris.norm), 1.0, rtol=1e-4)


def test_mtl_extension(tmp_path):
    write(tmp_path, "m.mtl",
          "newmtl redmat\nKd 1.0 0.25 0.25\nnewmtl bluemat\nKd 0.1 0.1 0.9\n")
    obj = ("mtllib m.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 1\n"
           "usemtl redmat\nf 1 2 3\nusemtl bluemat\nf 1 2 4\n")
    path = write(tmp_path, "t.obj", obj)

    mats = parse_mtl(str(tmp_path / "m.mtl"))
    assert set(mats) == {"redmat", "bluemat"}

    tris = parse_obj_with_mtl(path, offset=(0, 0, 0), scale=1.0,
                              transform=IDENT,
                              default_surface=matte(m3.make_color((5, 5, 5)),
                                                    0.2),
                              edge_thickness=0.0)
    np.testing.assert_allclose(tris.materials.color[0], [1.0, 0.25, 0.25],
                               rtol=1e-6)
    np.testing.assert_allclose(tris.materials.color[1], [0.1, 0.1, 0.9],
                               rtol=1e-6)


def test_mtl_specular_mapping():
    """Ks/Ns/d/illum -> Reflective mapping (documented on parse_mtl)."""
    import os

    from rust_raytrace_tpu.materials import (KIND_MATTE, KIND_REFLECTIVE)

    assets = os.path.join(os.path.dirname(__file__), "assets")
    mats = parse_mtl(os.path.join(assets, "two_mats.mtl"))
    assert set(mats) == {"red_matte", "mirror"}

    rm = mats["red_matte"]
    assert rm.kind == KIND_MATTE
    np.testing.assert_allclose(rm.color, [0.8, 0.1, 0.1], rtol=1e-6)
    assert abs(rm.alpha - 0.2 * 0.5) < 1e-6       # d scales the bounce

    mi = mats["mirror"]
    assert mi.kind == KIND_REFLECTIVE
    assert abs(mi.scattering - 1.0 / 21.0) < 1e-6  # Ns=400 -> 1/(1+20)
    assert abs(mi.alpha - 0.6) < 1e-6              # mean(Ks) * d

    tris = parse_obj_with_mtl(
        os.path.join(assets, "two_mats.obj"), offset=(0, 0, 0), scale=1.0,
        transform=np.eye(3, dtype=np.float32),
        default_surface=__import__(
            "rust_raytrace_tpu.materials", fromlist=["matte"]).matte(
                np.asarray([1, 1, 1], np.float32), 0.2),
        edge_thickness=0.0)
    assert tris.materials.kind[0] == KIND_MATTE
    assert tris.materials.kind[1] == KIND_REFLECTIVE


def test_mtl_scene_renders_reflection():
    """A Reflective MTL surface must actually bounce (engine + oracle)."""
    import os

    from rust_raytrace_tpu import math3d as m3
    from rust_raytrace_tpu import oracle
    from rust_raytrace_tpu.camera import create_viewport
    from rust_raytrace_tpu.engine import Engine
    from rust_raytrace_tpu.scene import assemble

    assets = os.path.join(os.path.dirname(__file__), "assets")
    from rust_raytrace_tpu.materials import matte
    tris = parse_obj_with_mtl(
        os.path.join(assets, "two_mats.obj"), offset=(0, 0, 0), scale=1.0,
        transform=np.eye(3, dtype=np.float32),
        default_surface=matte(np.asarray([1, 1, 1], np.float32), 0.2),
        edge_thickness=0.0)
    scene = assemble([tris])
    vp = create_viewport((32, 32), (1.0, 1.0), (0.0, 0.0, 0.0),
                         m3.unit(m3.vec(0.0, -0.35, 1.0)), 90.0, 0.0, 3, 1)
    img_o = oracle.render(scene.tris, vp, rng=oracle.FixedRng())
    eng = Engine(scene, page_size=8, ray_chunk=128, interpret=True)
    res = eng.render(vp, fixed_rng=True, quantize=False)
    diff = np.abs(res.image - img_o).max(axis=-1)
    assert (diff > 1 / 255).mean() < 0.01
    # the mirror triangle reflects the red triangle above: some pixels on
    # the lower triangle must carry red-dominant bounced color
    hit_any = res.image.sum(axis=-1) > 0
    assert hit_any.any()
