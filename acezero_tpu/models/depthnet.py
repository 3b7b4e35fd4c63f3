"""Monocular seed-depth head on top of the frozen feature encoder.

The reference bootstraps each reconstruction seed with ZoeDepth via
torch.hub (/root/reference/ace_zero.py:170-173, dataset_io.py:189-234) —
unavailable in hermetic environments. This head makes the framework
self-sufficient: a small stack of convs on the shared (frozen) ACE encoder
features predicts per-cell depth at the encoder's stride-8 resolution —
exactly the resolution the seed targets consume (`seed_scene_coordinates`
subsamples the depth canvas at stride 8 anyway), so no decoder is needed.

Seed depth only shapes the initial one-image map; the loop is
self-supervised afterwards, and the final similarity-aligned metrics are
scale-free — so relative (per-image up-to-scale) depth structure is what
matters, which is why pretraining uses the scale-invariant log loss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from acezero_tpu.models.common import conv2d, init_conv, relu

# (name, kh, kw, cin, cout); d_conv1 consumes local features concatenated
# with the image-global mean feature (the encoder's receptive field is far
# too local for scene-scale reasoning; the global path carries it)
def _layers(width_mult: int = 1):
    m = max(1, int(width_mult))
    return [
        ("d_conv1", 3, 3, 1024, 256 * m),
        ("d_conv2", 3, 3, 256 * m, 128 * m),
        ("d_conv3", 1, 1, 128 * m, 64 * m),
        ("d_conv4", 1, 1, 64 * m, 1),
    ]


_LAYERS = _layers(1)


def init_depth_head_params(key: jax.Array, width_mult: int = 1) -> dict:
    """Depth-head params; `width_mult` scales the hidden widths (capacity
    probe for the learned-depth ring-collapse suspect — the stored shapes
    carry the architecture, so load/apply infer it)."""
    layers = _layers(width_mult)
    params = {}
    keys = jax.random.split(key, len(layers))
    for k, (name, kh, kw, cin, cout) in zip(keys, layers):
        params[name] = init_conv(k, kh, kw, cin, cout)
    return params


def depth_head_apply(params: dict, features: jax.Array) -> jax.Array:
    """(N, hs, ws, C) encoder features -> (N, hs, ws) metric depth (> 0).

    The head predicts log-depth; exp keeps the output positive and makes the
    scale-invariant training loss linear in the prediction.
    """
    cin = params["d_conv1"]["w"].shape[2]
    if cin == 2 * features.shape[-1]:
        # global-context variant: concat the image-mean feature per cell
        g = jnp.mean(features, axis=(1, 2), keepdims=True)
        x = jnp.concatenate([features, jnp.broadcast_to(g, features.shape)], axis=-1)
    else:
        x = features
    x = relu(conv2d(x, params["d_conv1"], 1))
    x = relu(conv2d(x, params["d_conv2"], 1))
    x = relu(conv2d(x, params["d_conv3"], 1))
    log_d = conv2d(x, params["d_conv4"], 1).astype(jnp.float32)[..., 0]
    return jnp.exp(jnp.clip(log_d, -4.0, 6.0))


def gradient_matching_loss(
    pred_depth: jax.Array, gt_depth: jax.Array, valid: jax.Array
) -> jax.Array:
    """L1 on log-depth spatial gradients (structure term).

    The scale-invariant term alone lets low-frequency structure drift; the
    gradient term pins depth discontinuities and surface slopes.
    """
    lp = jnp.log(jnp.maximum(pred_depth, 1e-6))
    lg = jnp.log(jnp.maximum(gt_depth, 1e-6))
    d = lp - lg
    vx = (valid[..., :, 1:] & valid[..., :, :-1]).astype(jnp.float32)
    vy = (valid[..., 1:, :] & valid[..., :-1, :]).astype(jnp.float32)
    gx = jnp.abs(d[..., :, 1:] - d[..., :, :-1]) * vx
    gy = jnp.abs(d[..., 1:, :] - d[..., :-1, :]) * vy
    n = jnp.maximum(jnp.sum(vx) + jnp.sum(vy), 1.0)
    return (jnp.sum(gx) + jnp.sum(gy)) / n


def silog_loss(
    pred_depth: jax.Array,
    gt_depth: jax.Array,
    valid: jax.Array,
    lam: float = 0.85,
) -> jax.Array:
    """Eigen scale-invariant log loss over valid cells.

    lam=1 ignores global scale entirely; 0.85 keeps a little metric anchor
    (the corpus scale), matching common monodepth practice.
    """
    w = valid.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w), 1.0)
    d = (jnp.log(jnp.maximum(pred_depth, 1e-6)) - jnp.log(jnp.maximum(gt_depth, 1e-6))) * w
    return jnp.sum(d * d) / n - lam * (jnp.sum(d) / n) ** 2
