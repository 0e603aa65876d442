"""Scene pipeline tests: YAML schema (all 8 bundled scenes parse), OBJ/PLY
loaders, world-space baking."""

import os

import numpy as np
import pytest

from tests.conftest import REFERENCE_DIR
from paths_tpu.scene.yaml_loader import load_scene_description
from paths_tpu.scene.build import build_scene
from paths_tpu.scene.obj_loader import load_obj_file
from paths_tpu.scene.models import Model

SCENES = sorted(
    f for f in os.listdir(os.path.join(REFERENCE_DIR, "scenes")) if f.endswith(".yml")
)


@pytest.mark.parametrize("scene_file", SCENES)
def test_all_bundled_scenes_parse(scene_file):
    sd = load_scene_description(os.path.join(REFERENCE_DIR, "scenes", scene_file))
    assert sd.camera.image_width == 720
    assert len(sd.objects) > 0


def test_spheres_on_plane_build():
    sd = load_scene_description(
        os.path.join(REFERENCE_DIR, "scenes", "spheres_on_plane.yml")
    )
    static, scene, cam = build_scene(sd)
    assert static.n_spheres == 4
    assert static.n_tris == 0
    assert static.n_lights == 0
    assert static.sky_type == 1  # gradient
    np.testing.assert_allclose(np.asarray(cam.location), [3.0, 8.0, -15.0])
    # distance_from_lens = f*d/(d-f) (serde.rs:185)
    np.testing.assert_allclose(
        float(cam.distance_from_lens), 0.05 * 15.0 / (15.0 - 0.05), rtol=1e-6
    )


def test_teapot_build_world_space():
    sd = load_scene_description(os.path.join(REFERENCE_DIR, "scenes", "teapot.yml"))
    os.chdir(REFERENCE_DIR)  # YAML paths are CWD-relative in the reference
    try:
        static, scene, cam = build_scene(sd, search_dirs=[REFERENCE_DIR])
        assert static.n_tris == 6320  # teapot face count
        assert static.n_spheres == 2
        # Smooth normals on by default (serde.rs:250-252).
        assert bool(np.asarray(scene.tri_smooth).all())
        # Geometric normals unit length.
        n = np.asarray(scene.tri_n)
        np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)
    finally:
        os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_bunny_scene_builds_with_light():
    sd = load_scene_description(os.path.join(REFERENCE_DIR, "scenes", "bunny.yml"))
    static, scene, cam = build_scene(sd, search_dirs=[REFERENCE_DIR])
    assert static.n_lights == 1
    # The sphere light contributes a primitive tagged with its entity
    # (scene.rs:155-164).
    assert static.n_spheres == 4  # 3 object spheres + 1 light sphere
    light_ent = int(np.asarray(scene.light_ent)[0])
    assert bool(np.asarray(scene.ent_is_light)[light_ent])
    np.testing.assert_allclose(
        np.asarray(scene.ent_light_emission)[light_ent],
        np.array([0.8, 0.8, 1.0]) * 200.0,
    )


def test_obj_loader_teapot():
    models = load_obj_file(os.path.join(REFERENCE_DIR, "scenes/objects/teapot.obj"))
    assert len(models) == 1
    assert models[0].faces.shape == (6320, 3)
    assert models[0].vertices.shape[1] == 3


def test_vertex_normals_averaged():
    # Two triangles sharing an edge, normals +z each -> vertex normals +z.
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float64)
    faces = np.array([[0, 1, 2], [1, 3, 2]])
    m = Model(verts, faces)
    m.compute_vertex_normals()
    np.testing.assert_allclose(m.vertex_normals, [[0, 0, 1]] * 4, atol=1e-12)


def test_face_normal_winding():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float64)
    faces = np.array([[0, 1, 2]])
    m = Model(verts, faces)
    np.testing.assert_allclose(m.face_normals, [[0, 0, 1]], atol=1e-12)
