from paths_tpu.scene.types import SceneArrays, SceneStatic  # noqa: F401
from paths_tpu.scene.yaml_loader import load_scene_description  # noqa: F401
from paths_tpu.scene.build import build_scene  # noqa: F401
