from acezero_tpu.utils.precision import f32_matmul, HIGHEST

__all__ = ["f32_matmul", "HIGHEST"]
