from acezero_tpu.geometry.rotations import (
    quat_wxyz_to_matrix,
    matrix_to_quat_wxyz,
    rodrigues_to_matrix,
    matrix_to_rodrigues,
    special_gramschmidt,
    special_procrustes,
    rotation_angle,
)
from acezero_tpu.geometry.transforms import (
    invert_se3,
    to_homogeneous,
    make_se3,
    compose_se3,
)
from acezero_tpu.geometry.projection import (
    get_pixel_grid,
    project_points,
    backproject_depth,
    make_intrinsics,
)
from acezero_tpu.geometry.kabsch import kabsch_umeyama

__all__ = [
    "quat_wxyz_to_matrix",
    "matrix_to_quat_wxyz",
    "rodrigues_to_matrix",
    "matrix_to_rodrigues",
    "special_gramschmidt",
    "special_procrustes",
    "rotation_angle",
    "invert_se3",
    "to_homogeneous",
    "make_se3",
    "compose_se3",
    "get_pixel_grid",
    "project_points",
    "backproject_depth",
    "make_intrinsics",
    "kabsch_umeyama",
]
