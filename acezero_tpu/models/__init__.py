from acezero_tpu.models.encoder import init_encoder_params, encoder_apply, ENCODER_OUT_CHANNELS
from acezero_tpu.models.head import HeadConfig, init_head_params, head_apply_flat, head_apply_image
from acezero_tpu.models.posenet import init_posenet_params, posenet_apply
from acezero_tpu.models.regressor import Regressor, OUTPUT_SUBSAMPLE
from acezero_tpu.models import torch_io

__all__ = [
    "init_encoder_params",
    "encoder_apply",
    "ENCODER_OUT_CHANNELS",
    "HeadConfig",
    "init_head_params",
    "head_apply_flat",
    "head_apply_image",
    "init_posenet_params",
    "posenet_apply",
    "Regressor",
    "OUTPUT_SUBSAMPLE",
    "torch_io",
]
