from acezero_tpu.pretrain.encoder_pretrain import PretrainConfig, pretrain_encoder

__all__ = ["PretrainConfig", "pretrain_encoder"]
