from acezero_tpu.data.scene import SceneData, load_scene
from acezero_tpu.data.images import decode_to_canvas, GRAY_MEAN, GRAY_STD
from acezero_tpu.data.augment import augment_batch, normalize_images

__all__ = [
    "SceneData",
    "load_scene",
    "decode_to_canvas",
    "GRAY_MEAN",
    "GRAY_STD",
    "augment_batch",
    "normalize_images",
]
