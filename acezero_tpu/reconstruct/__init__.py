from acezero_tpu.reconstruct.config import AceZeroConfig
from acezero_tpu.reconstruct.pipeline import AceZeroPipeline

__all__ = ["AceZeroConfig", "AceZeroPipeline"]
