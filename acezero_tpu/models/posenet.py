"""Pose-refinement MLP: predicts additive deltas for 3x4 camera poses.

Reproduces the reference PoseNetwork (/root/reference/refine_poses.py:15-72)
with 0 extra blocks and 128 channels (the configuration the reference
instantiates at refine_poses.py:130): input is the flattened 3x4
world-to-camera pose (12 values), output is a 12-value delta. Runs in
float32 — the network is tiny and pose precision matters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from acezero_tpu.models.common import dense, init_dense, relu

POSENET_CHANNELS = 128


def init_posenet_params(key: jax.Array, channels: int = POSENET_CHANNELS) -> dict:
    keys = iter(jax.random.split(key, 8))
    return {
        "conv1": init_dense(next(keys), 12, channels),
        "conv2": init_dense(next(keys), channels, channels),
        "conv3": init_dense(next(keys), channels, channels),
        "head_skip": init_dense(next(keys), 12, channels),
        "fc1": init_dense(next(keys), channels, channels),
        "fc2": init_dense(next(keys), channels, channels),
        "fc3": init_dense(next(keys), channels, 12),
    }


def posenet_apply(params: dict, poses_flat: jax.Array) -> jax.Array:
    """(B, 12) flattened poses -> (B, 12) predicted deltas (float32)."""
    f32 = jnp.float32
    x = relu(dense(poses_flat, params["conv1"], f32))
    x = relu(dense(x, params["conv2"], f32))
    x = relu(dense(x, params["conv3"], f32))
    res = dense(poses_flat, params["head_skip"], f32) + x
    out = relu(dense(res, params["fc1"], f32))
    out = relu(dense(out, params["fc2"], f32))
    return dense(out, params["fc3"], f32)
