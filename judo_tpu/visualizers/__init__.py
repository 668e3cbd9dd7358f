from judo_tpu.visualizers.scene import SceneModel, build_scene, trace_segments_to_scene
from judo_tpu.visualizers.widgets import WidgetSpec, reflect_config
from judo_tpu.visualizers.visualizer import Visualizer

__all__ = [
    "SceneModel",
    "Visualizer",
    "WidgetSpec",
    "build_scene",
    "reflect_config",
    "trace_segments_to_scene",
]
