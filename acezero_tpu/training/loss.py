"""Reprojection losses, masked fixed-shape versions of the reference zoo.

Mirrors /root/reference/ace_loss.py exactly in value: every variant returns
the *sum* over the selected pixels (the caller divides by batch size), and
the dynamic tanh schedule anneals the soft clamp from `soft_clamp` to
`soft_clamp_min` over training with an optional circle schedule. Where the
reference boolean-indexes variable-size tensors, we multiply by the validity
mask instead — same numbers, static shapes.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

LOSS_TYPES = ("tanh", "dyntanh", "l1", "l1+sqrt", "l1+logl1")


@dataclass(frozen=True)
class ReproLossConfig:
    total_iterations: int = 25000
    soft_clamp: float = 50.0
    soft_clamp_min: float = 1.0
    loss_type: str = "dyntanh"
    circle_schedule: bool = True  # reference repro_loss_schedule == 'circle'


def _weighted_tanh_sum(errs: jax.Array, mask: jax.Array, weight) -> jax.Array:
    return weight * jnp.sum(jnp.tanh(errs / weight) * mask)


def dyntanh_weight(cfg: ReproLossConfig, iteration: jax.Array) -> jax.Array:
    """Annealed soft-clamp weight (reference ace_loss.py:57-66)."""
    t = jnp.clip(iteration / cfg.total_iterations, 0.0, 1.0)
    if cfg.circle_schedule:
        sw = 1.0 - jnp.sqrt(jnp.maximum(1.0 - t * t, 0.0))
    else:
        sw = t
    return (1.0 - sw) * cfg.soft_clamp + cfg.soft_clamp_min


def repro_loss(
    cfg: ReproLossConfig, errs: jax.Array, valid_mask: jax.Array, iteration: jax.Array
) -> jax.Array:
    """Sum of the configured robust loss over valid pixels.

    Args:
      errs: (B,) per-pixel reprojection errors (the reference uses the L1
        norm of the 2D residual).
      valid_mask: (B,) boolean or float mask.
      iteration: scalar current iteration (drives the dyntanh schedule).
    """
    mask = valid_mask.astype(errs.dtype)
    if cfg.loss_type == "tanh":
        return _weighted_tanh_sum(errs, mask, cfg.soft_clamp)
    if cfg.loss_type == "dyntanh":
        return _weighted_tanh_sum(errs, mask, dyntanh_weight(cfg, iteration))
    if cfg.loss_type == "l1":
        small = mask * (errs <= cfg.soft_clamp)
        return jnp.sum(errs * small)
    if cfg.loss_type == "l1+sqrt":
        big = errs > cfg.soft_clamp
        loss_small = jnp.sum(errs * mask * (~big))
        loss_big = jnp.sum(jnp.sqrt(cfg.soft_clamp * jnp.maximum(errs, 1e-12)) * mask * big)
        return loss_small + loss_big
    if cfg.loss_type in ("l1+logl1", "l1+log"):
        big = errs > cfg.soft_clamp
        loss_small = jnp.sum(errs * mask * (~big))
        loss_big = jnp.sum(jnp.log1p(cfg.soft_clamp * errs) * mask * big)
        return loss_small + loss_big
    raise ValueError(f"Unknown loss type {cfg.loss_type!r}; expected one of {LOSS_TYPES}")
