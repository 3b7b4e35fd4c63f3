"""Scene-coordinate regression head — the per-scene "map" network.

Architecture reproduces the reference Head (/root/reference/ace_network.py:
62-149): all layers are 1x1 convolutions, i.e. dense layers over the feature
axis, which on TPU become pure MXU matmuls over a (batch, 512) activation.
One always-on residual block plus `num_head_blocks` extra blocks, two fc
layers, and a final projection to 3 coordinates (or 4 homogeneous ones with a
softplus-bounded scale, scale in [min_scale, max_scale]); the scene-mean
offset is added at the end.

The head has no spatial context (1x1 receptive field), so the training-time
input is simply the flat patch batch (B, C) — no fake-BCHW reshaping needed
(the reference reshapes to 16x32 images purely as a CUDA throughput trick,
ace_trainer.py:515-518).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from acezero_tpu.models.common import dense, init_dense, relu


@dataclass(frozen=True)
class HeadConfig:
    num_head_blocks: int = 1
    use_homogeneous: bool = True
    in_channels: int = 512
    head_channels: int = 512
    homogeneous_min_scale: float = 0.01
    homogeneous_max_scale: float = 4.0


def init_head_params(key: jax.Array, cfg: HeadConfig, mean: jax.Array) -> dict:
    """Initialize head params; `mean` is the scene-mean buffer (3,)."""
    n_layers = 5 + 3 * cfg.num_head_blocks + (1 if cfg.in_channels != cfg.head_channels else 0) + 1
    keys = iter(jax.random.split(key, n_layers + 4))
    c = cfg.head_channels
    params: dict = {
        "res3_conv1": init_dense(next(keys), cfg.in_channels, c),
        "res3_conv2": init_dense(next(keys), c, c),
        "res3_conv3": init_dense(next(keys), c, c),
        "fc1": init_dense(next(keys), c, c),
        "fc2": init_dense(next(keys), c, c),
        "fc3": init_dense(next(keys), c, 4 if cfg.use_homogeneous else 3),
        "blocks": [
            {
                "c0": init_dense(next(keys), c, c),
                "c1": init_dense(next(keys), c, c),
                "c2": init_dense(next(keys), c, c),
            }
            for _ in range(cfg.num_head_blocks)
        ],
        "mean": jnp.asarray(mean, jnp.float32).reshape(3),
    }
    if cfg.in_channels != cfg.head_channels:
        params["head_skip"] = init_dense(next(keys), cfg.in_channels, c)
    return params


def head_apply_flat(
    params: dict, cfg: HeadConfig, features: jax.Array, compute_dtype=jnp.bfloat16
) -> jax.Array:
    """(B, C) features -> (B, 3) scene coordinates in float32."""
    x = relu(dense(features, params["res3_conv1"], compute_dtype))
    x = relu(dense(x, params["res3_conv2"], compute_dtype))
    x = relu(dense(x, params["res3_conv3"], compute_dtype))

    if "head_skip" in params:
        res = dense(features, params["head_skip"], compute_dtype) + x
    else:
        res = features.astype(compute_dtype) + x

    for block in params["blocks"]:
        x = relu(dense(res, block["c0"], compute_dtype))
        x = relu(dense(x, block["c1"], compute_dtype))
        x = relu(dense(x, block["c2"], compute_dtype))
        res = res + x

    sc = relu(dense(res, params["fc1"], compute_dtype))
    sc = relu(dense(sc, params["fc2"], compute_dtype))
    return head_epilogue(params, cfg, sc, compute_dtype)


def head_epilogue(
    params: dict, cfg: HeadConfig, hidden: jax.Array, compute_dtype=jnp.bfloat16
) -> jax.Array:
    """Final projection + homogeneous dehomogenization + scene-mean offset.

    Split out so the Pallas fused chain (acezero_tpu/ops/fused_head.py) can
    reuse the exact epilogue semantics.
    """
    sc = dense(hidden, params["fc3"], compute_dtype).astype(jnp.float32)

    if cfg.use_homogeneous:
        max_inv_scale = 1.0 / cfg.homogeneous_max_scale
        min_inv_scale = 1.0 / cfg.homogeneous_min_scale
        # softplus with beta, offset so the scale lies in [min, max]
        # (reference ace_network.py:105-144)
        h_beta = math.log(2.0) / (1.0 - max_inv_scale)
        h = jax.nn.softplus(h_beta * sc[..., 3]) / h_beta + max_inv_scale
        h = jnp.minimum(h, min_inv_scale)
        sc = sc[..., :3] / h[..., None]

    return sc + params["mean"].astype(jnp.float32)


def head_apply_image(
    params: dict, cfg: HeadConfig, features_nhwc: jax.Array, compute_dtype=jnp.bfloat16
) -> jax.Array:
    """(N, h, w, C) feature maps -> (N, h, w, 3) scene coordinates.

    1x1 convs have no spatial extent, so image inference is the flat apply
    over the flattened pixel axis.
    """
    n, h, w, c = features_nhwc.shape
    flat = features_nhwc.reshape(n * h * w, c)
    out = head_apply_flat(params, cfg, flat, compute_dtype)
    return out.reshape(n, h, w, 3)
