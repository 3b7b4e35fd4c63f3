from acezero_tpu.export.point_cloud import export_point_cloud_from_network, point_cloud_from_network
from acezero_tpu.export.cameras import export_camera_meshes

__all__ = [
    "export_point_cloud_from_network",
    "point_cloud_from_network",
    "export_camera_meshes",
]
