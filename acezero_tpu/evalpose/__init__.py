from acezero_tpu.evalpose.alignment import estimate_alignment
from acezero_tpu.evalpose.evaluate import evaluate_poses, PoseErrors

__all__ = ["estimate_alignment", "evaluate_poses", "PoseErrors"]
