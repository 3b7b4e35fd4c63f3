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
from typing import NamedTuple

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


class ReproLossHP(NamedTuple):
    """Runtime (traced) loss hyperparameters.

    Like the schedule's ScheduleHP, the loss KIND and its float knobs are
    runtime scalars so the mapping round (tanh) and the final refit (dyntanh)
    share one compiled train-chunk program (every distinct program pays a
    large first-call cost on the shared-host relay). All five variants are a
    few elementwise ops + one reduction each over the batch — computing all
    and selecting costs nothing next to the head matmuls.
    """

    kind: jax.Array  # int32 index into LOSS_TYPES
    total_iters: jax.Array  # float32
    soft_clamp: jax.Array
    soft_clamp_min: jax.Array
    circle_schedule: jax.Array  # bool


def loss_hp(cfg: ReproLossConfig) -> ReproLossHP:
    import numpy as np

    kind = "l1+logl1" if cfg.loss_type == "l1+log" else cfg.loss_type
    return ReproLossHP(
        kind=np.int32(LOSS_TYPES.index(kind)),
        total_iters=np.float32(cfg.total_iterations),
        soft_clamp=np.float32(cfg.soft_clamp),
        soft_clamp_min=np.float32(cfg.soft_clamp_min),
        circle_schedule=np.bool_(cfg.circle_schedule),
    )


def dyntanh_weight_hp(hp: ReproLossHP, iteration: jax.Array) -> jax.Array:
    t = jnp.clip(iteration / jnp.maximum(hp.total_iters, 1.0), 0.0, 1.0)
    sw_circle = 1.0 - jnp.sqrt(jnp.maximum(1.0 - t * t, 0.0))
    sw = jnp.where(hp.circle_schedule, sw_circle, t)
    return (1.0 - sw) * hp.soft_clamp + hp.soft_clamp_min


def repro_loss_hp(
    hp: ReproLossHP, errs: jax.Array, valid_mask: jax.Array, iteration: jax.Array
) -> jax.Array:
    """`repro_loss` with the variant selected at runtime by hp.kind."""
    mask = valid_mask.astype(errs.dtype)
    loss_tanh = _weighted_tanh_sum(errs, mask, hp.soft_clamp)
    loss_dyntanh = _weighted_tanh_sum(errs, mask, dyntanh_weight_hp(hp, iteration))
    big = errs > hp.soft_clamp
    loss_small = jnp.sum(errs * mask * (~big))
    loss_l1 = loss_small
    loss_l1_sqrt = loss_small + jnp.sum(
        jnp.sqrt(hp.soft_clamp * jnp.maximum(errs, 1e-12)) * mask * big
    )
    loss_l1_log = loss_small + jnp.sum(jnp.log1p(hp.soft_clamp * errs) * mask * big)
    stacked = jnp.stack([loss_tanh, loss_dyntanh, loss_l1, loss_l1_sqrt, loss_l1_log])
    return stacked[hp.kind]


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
    if cfg.loss_type not in LOSS_TYPES and cfg.loss_type != "l1+log":
        raise ValueError(f"Unknown loss type {cfg.loss_type!r}; expected one of {LOSS_TYPES}")
    return repro_loss_hp(loss_hp(cfg), errs, valid_mask, iteration)
