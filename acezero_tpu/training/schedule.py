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

Program-unification note: the schedule KIND and its float knobs are runtime
scalars (`ScheduleHP`), not compile-time constants — all three schedules are
computed branch-free and selected by `hp.kind`. The mapping round (1cyclepoly
@ lr 0.003) and the final refit (circle @ lr 0.005) therefore share ONE
compiled train-chunk program instead of recompiling per recipe; on the
shared-host axon relay every distinct compiled program pays a large,
high-variance first-call cost (measured 7-330 s), which dominated the
round-4 chess-scale wall-clock spread.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

SCHEDULE_KINDS = ("constant", "circle", "1cyclepoly")


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


class ScheduleHP(NamedTuple):
    """Runtime (traced) schedule hyperparameters — see the module note."""

    kind: jax.Array  # int32 index into SCHEDULE_KINDS
    total: jax.Array  # float32, cfg.iterations
    lr_min: jax.Array
    lr_max: jax.Array
    warmup_iters: jax.Array  # float32
    warmup_lr: jax.Array
    cooldown_iters: jax.Array  # float32
    trigger: jax.Array  # float32 cooldown_trigger_percent


def schedule_hp(cfg: ScheduleConfig) -> ScheduleHP:
    import numpy as np

    return ScheduleHP(
        kind=np.int32(SCHEDULE_KINDS.index(cfg.schedule)),
        total=np.float32(cfg.iterations),
        lr_min=np.float32(cfg.learning_rate_min),
        lr_max=np.float32(cfg.learning_rate_max),
        warmup_iters=np.float32(cfg.warmup_iterations),
        warmup_lr=np.float32(cfg.warmup_learning_rate),
        cooldown_iters=np.float32(cfg.cooldown_iterations),
        trigger=np.float32(cfg.cooldown_trigger_percent),
    )


def init_schedule(cfg: ScheduleConfig) -> ScheduleState:
    return ScheduleState(
        in_cooldown=jnp.asarray(False),
        cooldown_start=jnp.asarray(cfg.iterations, jnp.int32),
        max_iterations=jnp.asarray(cfg.iterations, jnp.int32),
        stat_buffer=jnp.zeros((cfg.cooldown_buffer_size,), jnp.float32),
        stat_ptr=jnp.asarray(0, jnp.int32),
    )


def schedule_lr_hp(hp: ScheduleHP, state: ScheduleState, iteration: jax.Array) -> jax.Array:
    """Learning rate at `iteration`: all three schedules computed branch-free
    and selected by hp.kind (see the module's program-unification note)."""
    it = iteration.astype(jnp.float32)

    # constant ------------------------------------------------------------
    lr_const = hp.lr_min

    # circle: torch OneCycleLR defaults (cos strategy) ---------------------
    pct_start = 0.3
    initial_lr = hp.lr_max / 25.0
    final_lr = initial_lr / 1e4
    up_steps = pct_start * hp.total - 1.0
    down_steps = (hp.total - 1.0) - up_steps

    def cos_anneal(start, end, pct):
        return end + (start - end) / 2.0 * (jnp.cos(jnp.pi * pct) + 1.0)

    pct_up = jnp.clip(it / jnp.maximum(up_steps, 1.0), 0.0, 1.0)
    pct_down = jnp.clip((it - up_steps) / jnp.maximum(down_steps, 1.0), 0.0, 1.0)
    lr_up = cos_anneal(initial_lr, hp.lr_max, pct_up)
    lr_down = cos_anneal(hp.lr_max, final_lr, pct_down)
    lr_circle = jnp.where(it <= up_steps, lr_up, lr_down)

    # 1cyclepoly -----------------------------------------------------------
    warmup_frac = jnp.clip(it / jnp.maximum(hp.warmup_iters, 1.0), 0.0, 1.0)
    sf = hp.warmup_lr / hp.lr_max
    lr_warm = hp.lr_max * (sf + (1.0 - sf) * warmup_frac)

    cd_elapsed = (iteration - state.cooldown_start).astype(jnp.float32)
    cd_frac = jnp.clip(cd_elapsed / jnp.maximum(hp.cooldown_iters, 1.0), 0.0, 1.0)
    ef = hp.lr_min / hp.lr_max
    lr_cool = hp.lr_max * (1.0 + (ef - 1.0) * cd_frac)

    in_cd = state.in_cooldown & (iteration >= state.cooldown_start)
    lr_poly = jnp.where(in_cd, lr_cool, jnp.where(it < hp.warmup_iters, lr_warm, hp.lr_max))

    return jnp.where(
        hp.kind == 0, lr_const, jnp.where(hp.kind == 1, lr_circle, lr_poly)
    ).astype(jnp.float32)


def schedule_update_hp(
    hp: ScheduleHP, state: ScheduleState, iteration: jax.Array, batch_inliers: jax.Array
) -> ScheduleState:
    """Post-step update: cooldown trigger check + rolling statistic push.

    Mirrors check_and_set_cooldown (called before the step with the current
    iteration) followed by the buffer append in step()
    (/root/reference/ace_schedule.py:72-126). Only 1cyclepoly owns a cooldown;
    for the other kinds the state passes through unchanged (runtime select).
    """
    # trigger evaluation (reference runs it before the parameter step)
    past_warmup = iteration >= hp.warmup_iters
    by_duration = iteration >= (state.max_iterations - hp.cooldown_iters)
    by_dynamic = jnp.min(state.stat_buffer) > hp.trigger
    is_poly = hp.kind == 2
    trigger = is_poly & (~state.in_cooldown) & past_warmup & (by_duration | by_dynamic)

    in_cooldown = state.in_cooldown | trigger
    cooldown_start = jnp.where(trigger, iteration, state.cooldown_start)
    max_iterations = jnp.where(
        trigger, (iteration + hp.cooldown_iters).astype(jnp.int32), state.max_iterations
    ).astype(jnp.int32)

    stat_buffer = jnp.where(
        is_poly,
        state.stat_buffer.at[state.stat_ptr].set(batch_inliers.astype(jnp.float32)),
        state.stat_buffer,
    )
    stat_ptr = jnp.where(
        is_poly, (state.stat_ptr + 1) % state.stat_buffer.shape[0], state.stat_ptr
    ).astype(jnp.int32)

    return ScheduleState(
        in_cooldown=in_cooldown,
        cooldown_start=cooldown_start.astype(jnp.int32),
        max_iterations=max_iterations,
        stat_buffer=stat_buffer,
        stat_ptr=stat_ptr,
    )


def schedule_lr(cfg: ScheduleConfig, state: ScheduleState, iteration: jax.Array) -> jax.Array:
    """Config-level convenience wrapper around `schedule_lr_hp`."""
    if cfg.schedule not in SCHEDULE_KINDS:
        raise ValueError(f"Unknown learning rate schedule: {cfg.schedule}")
    return schedule_lr_hp(schedule_hp(cfg), state, iteration)


def schedule_update(
    cfg: ScheduleConfig, state: ScheduleState, iteration: jax.Array, batch_inliers: jax.Array
) -> ScheduleState:
    """Config-level convenience wrapper around `schedule_update_hp`."""
    return schedule_update_hp(schedule_hp(cfg), state, iteration, batch_inliers)
