from acezero_tpu.registration.p3p import p3p_grunert, solve_quartic
from acezero_tpu.registration.lm import lm_pnp, reprojection_errors
from acezero_tpu.registration.ransac import (
    RansacConfig,
    estimate_pose,
    estimate_poses_batch,
)

__all__ = [
    "p3p_grunert",
    "solve_quartic",
    "lm_pnp",
    "reprojection_errors",
    "RansacConfig",
    "estimate_pose",
    "estimate_poses_batch",
]
