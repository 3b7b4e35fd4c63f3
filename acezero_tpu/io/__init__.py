from acezero_tpu.io.pose_files import (
    PoseFileEntry,
    read_pose_file,
    write_pose_file,
    format_pose_line,
    load_pose_matrix,
    load_pose_files_glob,
    load_focal_length,
    get_files_from_glob,
    registration_rates,
)
from acezero_tpu.io.ply import write_ply_points, write_ply_mesh

__all__ = [
    "PoseFileEntry",
    "read_pose_file",
    "write_pose_file",
    "format_pose_line",
    "load_pose_matrix",
    "load_pose_files_glob",
    "load_focal_length",
    "get_files_from_glob",
    "registration_rates",
    "write_ply_points",
    "write_ply_mesh",
]
