from acezero_tpu.viz.renderer import render_point_cloud, render_cameras, composite_frame
from acezero_tpu.viz.visualizer import ReconstructionVisualizer, VizConfig

__all__ = [
    "render_point_cloud",
    "render_cameras",
    "composite_frame",
    "ReconstructionVisualizer",
    "VizConfig",
]
