"""Frozen convolutional feature encoder (stride 8, 512 channels).

Architecture reproduces the reference FCN encoder
(/root/reference/ace_network.py:14-59): 4 downsampling convs (strides
1,2,2,2) followed by two residual stages, final channel count 512. It runs
NHWC/bf16 on the MXU; the reference pretrained weights
(`ace_encoder_pretrained.pt`) can be imported via
`acezero_tpu.models.torch_io.import_encoder_state_dict`.

The encoder is scene-agnostic and frozen during mapping — only its forward
pass matters, and only during the one-time training-buffer fill and during
registration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from acezero_tpu.models.common import conv2d, init_conv, relu

ENCODER_OUT_CHANNELS = 512

# (name, kh, kw, cin, cout, stride)
_LAYERS = [
    ("conv1", 3, 3, 1, 32, 1),
    ("conv2", 3, 3, 32, 64, 2),
    ("conv3", 3, 3, 64, 128, 2),
    ("conv4", 3, 3, 128, 256, 2),
    ("res1_conv1", 3, 3, 256, 256, 1),
    ("res1_conv2", 1, 1, 256, 256, 1),
    ("res1_conv3", 3, 3, 256, 256, 1),
    ("res2_conv1", 3, 3, 256, 512, 1),
    ("res2_conv2", 1, 1, 512, 512, 1),
    ("res2_conv3", 3, 3, 512, ENCODER_OUT_CHANNELS, 1),
    ("res2_skip", 1, 1, 256, ENCODER_OUT_CHANNELS, 1),
]


def init_encoder_params(key: jax.Array, out_channels: int = ENCODER_OUT_CHANNELS) -> dict:
    params = {}
    keys = jax.random.split(key, len(_LAYERS))
    for k, (name, kh, kw, cin, cout, _) in zip(keys, _LAYERS):
        if name in ("res2_conv3", "res2_skip"):
            cout = out_channels
        params[name] = init_conv(k, kh, kw, cin, cout)
    return params


def encoder_apply(params: dict, images_nhwc: jax.Array, compute_dtype=jnp.bfloat16) -> jax.Array:
    """(N, H, W, 1) grayscale (normalized) -> (N, H/8, W/8, C) features."""
    x = conv2d(images_nhwc, params["conv1"], 1, compute_dtype)
    x = relu(x)
    x = relu(conv2d(x, params["conv2"], 2, compute_dtype))
    x = relu(conv2d(x, params["conv3"], 2, compute_dtype))
    res = relu(conv2d(x, params["conv4"], 2, compute_dtype))

    x = relu(conv2d(res, params["res1_conv1"], 1, compute_dtype))
    x = relu(conv2d(x, params["res1_conv2"], 1, compute_dtype))
    x = relu(conv2d(x, params["res1_conv3"], 1, compute_dtype))
    res = res + x

    x = relu(conv2d(res, params["res2_conv1"], 1, compute_dtype))
    x = relu(conv2d(x, params["res2_conv2"], 1, compute_dtype))
    x = relu(conv2d(x, params["res2_conv3"], 1, compute_dtype))

    return conv2d(res, params["res2_skip"], 1, compute_dtype) + x
