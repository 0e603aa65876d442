"""Native mesh loader tests: the C++ OBJ/PLY parsers (native/mesh_io.cc)
must produce output identical to the pure-Python reference loaders."""

import os
import struct

import numpy as np
import pytest

from tests.conftest import REFERENCE_DIR
from paths_tpu import native
from paths_tpu.scene.obj_loader import load_obj_file
from paths_tpu.scene.ply_loader import load_ply_file

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)

TEAPOT = os.path.join(REFERENCE_DIR, "scenes", "objects", "teapot.obj")


def _assert_obj_models_equal(a, b):
    assert len(a) == len(b)
    for ma, mb in zip(a, b):
        np.testing.assert_array_equal(ma.vertices, mb.vertices)
        np.testing.assert_array_equal(ma.faces, mb.faces)
        assert (ma.texcoords is None) == (mb.texcoords is None)
        if ma.texcoords is not None:
            np.testing.assert_array_equal(ma.texcoords, mb.texcoords)
        assert (ma.diffuse is None) == (mb.diffuse is None)
        if ma.diffuse is not None:
            np.testing.assert_array_equal(ma.diffuse, mb.diffuse)


def test_obj_native_matches_python_teapot():
    _assert_obj_models_equal(
        load_obj_file(TEAPOT, use_native=True),
        load_obj_file(TEAPOT, use_native=False),
    )


def test_obj_native_multi_model_mtl(tmp_path):
    """Model splitting on o/g, negative indices, quads (fan triangulation),
    and .mtl diffuse resolution."""
    mtl = tmp_path / "m.mtl"
    mtl.write_text("newmtl red\nKd 0.9 0.1 0.2\nnewmtl blu\nKd 0.1 0.2 0.9\n")
    obj = tmp_path / "t.obj"
    obj.write_text(
        "mtllib m.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "o quad\nusemtl red\nf 1 2 3 4\n"
        "v 2 0 0\nv 3 0 0\nv 3 1 0\n"
        "o tri\nusemtl blu\nf -3 -2 -1\n"
    )
    a = load_obj_file(str(obj), use_native=True)
    b = load_obj_file(str(obj), use_native=False)
    _assert_obj_models_equal(a, b)
    assert len(a) == 2
    assert a[0].faces.shape == (2, 3)  # quad fan-triangulated
    np.testing.assert_allclose(a[0].diffuse, [0.9, 0.1, 0.2])
    np.testing.assert_allclose(a[1].diffuse, [0.1, 0.2, 0.9])


def _write_ply_binary(path, verts, faces, colours=None):
    props = ["property float x", "property float y", "property float z"]
    if colours is not None:
        props += ["property uchar red", "property uchar green", "property uchar blue"]
    hdr = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {len(verts)}\n" + "\n".join(props) + "\n"
        f"element face {len(faces)}\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
    )
    with open(path, "wb") as f:
        f.write(hdr.encode())
        for i, v in enumerate(verts):
            f.write(struct.pack("<3f", *v))
            if colours is not None:
                f.write(struct.pack("<3B", *colours[i]))
        for face in faces:
            f.write(struct.pack("<B3i", 3, *face))


def _write_ply_ascii(path, verts, faces, colours=None):
    props = ["property float x", "property float y", "property float z"]
    if colours is not None:
        props += ["property uchar red", "property uchar green", "property uchar blue"]
    lines = [
        "ply", "format ascii 1.0",
        f"element vertex {len(verts)}", *props,
        f"element face {len(faces)}",
        "property list uchar int vertex_indices",
        "end_header",
    ]
    for i, v in enumerate(verts):
        row = f"{v[0]} {v[1]} {v[2]}"
        if colours is not None:
            c = colours[i]
            row += f" {c[0]} {c[1]} {c[2]}"
        lines.append(row)
    for face in faces:
        lines.append("3 " + " ".join(str(x) for x in face))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


@pytest.mark.parametrize("writer", [_write_ply_binary, _write_ply_ascii])
@pytest.mark.parametrize("with_colours", [False, True])
def test_ply_native_matches_python(tmp_path, writer, with_colours):
    rng = np.random.default_rng(0)
    verts = rng.uniform(-1, 1, (20, 3)).astype(np.float32)
    faces = rng.integers(0, 20, (30, 3))
    colours = rng.integers(0, 256, (20, 3)) if with_colours else None
    p = str(tmp_path / "t.ply")
    writer(p, verts, faces, colours)

    a = load_ply_file(p, use_native=True)
    b = load_ply_file(p, use_native=False)
    np.testing.assert_allclose(a.vertices, b.vertices, rtol=1e-7)
    np.testing.assert_array_equal(a.faces, b.faces)
    assert (a.vertex_colours is None) == (b.vertex_colours is None)
    if a.vertex_colours is not None:
        np.testing.assert_allclose(a.vertex_colours, b.vertex_colours, rtol=1e-7)
