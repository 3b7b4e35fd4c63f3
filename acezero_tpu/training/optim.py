"""AdamW with torch-default semantics over arbitrary param pytrees.

Matches torch.optim.AdamW defaults used throughout the reference
(ace_schedule.py:15,30,63; refine_poses.py:127,133; refine_calibration.py:26):
betas (0.9, 0.999), eps 1e-8, decoupled weight decay 0.01 scaled by lr.
The learning rate is a traced argument so schedules run inside lax.scan.

Written by hand (rather than optax) so the update stays a transparent pytree
map that composes with shard_map and conditional no-op steps.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class AdamWState(NamedTuple):
    step: jax.Array
    mu: Any
    nu: Any


def adamw_init(params: Any) -> AdamWState:
    zeros = lambda p: jnp.zeros_like(p, dtype=jnp.float32)
    return AdamWState(
        step=jnp.asarray(0, jnp.int32),
        mu=jax.tree.map(zeros, params),
        nu=jax.tree.map(zeros, params),
    )


def adamw_update(
    params: Any,
    grads: Any,
    state: AdamWState,
    lr: jax.Array,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.01,
    enabled: jax.Array | bool = True,
):
    """One AdamW step; when `enabled` is False the step is an exact no-op
    (params and optimizer state unchanged), which keeps conditional updates
    (pose_refinement_wait, post-max_iterations masking) branch-free."""
    step = state.step + jnp.where(enabled, 1, 0)
    t = jnp.maximum(step, 1).astype(jnp.float32)
    bc1 = 1.0 - beta1**t
    bc2 = 1.0 - beta2**t

    def upd(p, g, m, v):
        g = g.astype(jnp.float32)
        m_new = beta1 * m + (1.0 - beta1) * g
        v_new = beta2 * v + (1.0 - beta2) * (g * g)
        m_hat = m_new / bc1
        v_hat = v_new / bc2
        p_new = p * (1.0 - lr * weight_decay) - lr * m_hat / (jnp.sqrt(v_hat) + eps)
        keep = jnp.asarray(enabled)
        return (
            jnp.where(keep, p_new, p),
            jnp.where(keep, m_new, m),
            jnp.where(keep, v_new, v),
        )

    out = jax.tree.map(upd, params, grads, state.mu, state.nu)
    params_new = jax.tree.map(lambda x: x[0], out, is_leaf=lambda x: isinstance(x, tuple))
    mu_new = jax.tree.map(lambda x: x[1], out, is_leaf=lambda x: isinstance(x, tuple))
    nu_new = jax.tree.map(lambda x: x[2], out, is_leaf=lambda x: isinstance(x, tuple))
    return params_new, AdamWState(step=step, mu=mu_new, nu=nu_new)


def clip_global_norm(grads, max_norm: float):
    """Scale `grads` so their global L2 norm is at most `max_norm`."""
    import jax as _jax

    leaves = _jax.tree.leaves(grads)
    gn = jnp.sqrt(sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves))
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(gn, 1e-9))
    return _jax.tree.map(lambda l: (l * scale).astype(l.dtype), grads), gn


def clip_per_row_norm(grads, max_norm: float):
    """Clip a stacked pytree (leading axis = independent models) per row.

    Each row (e.g. one scene head in the pretraining head stack) is clipped
    by its own norm, so a single diverging model cannot zero out everyone
    else's update through a shared global scale.
    """
    import jax as _jax

    leaves = _jax.tree.leaves(grads)
    sq = sum(
        jnp.sum(l.astype(jnp.float32) ** 2, axis=tuple(range(1, l.ndim)))
        for l in leaves
    )  # (S,)
    gn = jnp.sqrt(sq)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(gn, 1e-9))  # (S,)

    def _apply(l):
        s = scale.reshape((-1,) + (1,) * (l.ndim - 1))
        return (l * s).astype(l.dtype)

    return _jax.tree.map(_apply, grads), gn
