from acezero_tpu.ops.fused_head import fused_head_mlp, head_params_to_stack

__all__ = ["fused_head_mlp", "head_params_to_stack"]
