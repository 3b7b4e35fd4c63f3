"""Learning-rate schedules with the early-stopping cooldown as device state.

Re-implements the three reference schedules (/root/reference/ace_schedule.py):

  constant    — stay at learning_rate_min;
  circle      — torch OneCycleLR(max_lr, total_steps, cos anneal,
                pct_start 0.3, div_factor 25, final_div_factor 1e4);
  1cyclepoly  — linear warmup to max over `warmup_iterations`, hold, then a
                linear cooldown to min over `cooldown_iterations`, triggered
                either by reaching (max_iterations - cooldown) or by the
                dynamic criterion: the minimum over the last 100 batches'
                inlier fraction exceeding `cooldown_trigger_percent`
                (ace_schedule.py:72-101). This early stop is *the* speed
                mechanism of ACE0 mapping rounds.

All of it lives in a small jnp state so the whole training loop stays inside
one lax.scan: the trigger check, the rolling 100-entry statistic buffer, and
the dynamic `max_iterations` shrink are branch-free device ops.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class ScheduleConfig:
    schedule: str = "1cyclepoly"  # constant | circle | 1cyclepoly
    iterations: int = 25000
    learning_rate_min: float = 0.0005
    learning_rate_max: float = 0.005
    warmup_iterations: int = 1000
    warmup_learning_rate: float = 0.0005
    cooldown_iterations: int = 5000
    cooldown_trigger_percent: float = 0.7
    cooldown_buffer_size: int = 100


class ScheduleState(NamedTuple):
    in_cooldown: jax.Array  # bool
    cooldown_start: jax.Array  # int32, valid when in_cooldown
    max_iterations: jax.Array  # int32, shrinks when cooldown triggers
    stat_buffer: jax.Array  # (buffer_size,) rolling batch-inlier fractions
    stat_ptr: jax.Array  # int32 rolling write index


def init_schedule(cfg: ScheduleConfig) -> ScheduleState:
    return ScheduleState(
        in_cooldown=jnp.asarray(False),
        cooldown_start=jnp.asarray(cfg.iterations, jnp.int32),
        max_iterations=jnp.asarray(cfg.iterations, jnp.int32),
        stat_buffer=jnp.zeros((cfg.cooldown_buffer_size,), jnp.float32),
        stat_ptr=jnp.asarray(0, jnp.int32),
    )


def schedule_lr(cfg: ScheduleConfig, state: ScheduleState, iteration: jax.Array) -> jax.Array:
    """Learning rate at `iteration` given the cooldown state."""
    it = iteration.astype(jnp.float32)
    if cfg.schedule == "constant":
        return jnp.asarray(cfg.learning_rate_min, jnp.float32)

    if cfg.schedule == "circle":
        # torch OneCycleLR defaults (cos strategy)
        total = cfg.iterations
        pct_start = 0.3
        initial_lr = cfg.learning_rate_max / 25.0
        final_lr = initial_lr / 1e4
        up_steps = float(pct_start * total) - 1.0
        down_steps = float(total - 1) - up_steps

        def cos_anneal(start, end, pct):
            return end + (start - end) / 2.0 * (jnp.cos(jnp.pi * pct) + 1.0)

        pct_up = jnp.clip(it / jnp.maximum(up_steps, 1.0), 0.0, 1.0)
        pct_down = jnp.clip((it - up_steps) / jnp.maximum(down_steps, 1.0), 0.0, 1.0)
        lr_up = cos_anneal(initial_lr, cfg.learning_rate_max, pct_up)
        lr_down = cos_anneal(cfg.learning_rate_max, final_lr, pct_down)
        return jnp.where(it <= up_steps, lr_up, lr_down)

    if cfg.schedule == "1cyclepoly":
        warmup_frac = jnp.clip(it / max(cfg.warmup_iterations, 1), 0.0, 1.0)
        sf = cfg.warmup_learning_rate / cfg.learning_rate_max
        lr_warm = cfg.learning_rate_max * (sf + (1.0 - sf) * warmup_frac)

        cd_elapsed = (iteration - state.cooldown_start).astype(jnp.float32)
        cd_frac = jnp.clip(cd_elapsed / max(cfg.cooldown_iterations, 1), 0.0, 1.0)
        ef = cfg.learning_rate_min / cfg.learning_rate_max
        lr_cool = cfg.learning_rate_max * (1.0 + (ef - 1.0) * cd_frac)

        in_cd = state.in_cooldown & (iteration >= state.cooldown_start)
        return jnp.where(in_cd, lr_cool, jnp.where(it < cfg.warmup_iterations, lr_warm, cfg.learning_rate_max))

    raise ValueError(f"Unknown learning rate schedule: {cfg.schedule}")


def schedule_update(
    cfg: ScheduleConfig, state: ScheduleState, iteration: jax.Array, batch_inliers: jax.Array
) -> ScheduleState:
    """Post-step update: cooldown trigger check + rolling statistic push.

    Mirrors check_and_set_cooldown (called before the step with the current
    iteration) followed by the buffer append in step()
    (/root/reference/ace_schedule.py:72-126).
    """
    if cfg.schedule != "1cyclepoly":
        return state

    # trigger evaluation (reference runs it before the parameter step)
    past_warmup = iteration >= cfg.warmup_iterations
    by_duration = iteration >= (state.max_iterations - cfg.cooldown_iterations)
    by_dynamic = jnp.min(state.stat_buffer) > cfg.cooldown_trigger_percent
    trigger = (~state.in_cooldown) & past_warmup & (by_duration | by_dynamic)

    in_cooldown = state.in_cooldown | trigger
    cooldown_start = jnp.where(trigger, iteration, state.cooldown_start)
    max_iterations = jnp.where(
        trigger, iteration + cfg.cooldown_iterations, state.max_iterations
    ).astype(jnp.int32)

    stat_buffer = state.stat_buffer.at[state.stat_ptr].set(batch_inliers.astype(jnp.float32))
    stat_ptr = (state.stat_ptr + 1) % cfg.cooldown_buffer_size

    return ScheduleState(
        in_cooldown=in_cooldown,
        cooldown_start=cooldown_start.astype(jnp.int32),
        max_iterations=max_iterations,
        stat_buffer=stat_buffer,
        stat_ptr=stat_ptr,
    )
