"""SE(3) helpers, pure JAX, batch-friendly over leading dimensions."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from acezero_tpu.utils.precision import f32_matmul


def make_se3(R: jax.Array, t: jax.Array) -> jax.Array:
    """Assemble 4x4 transforms from (..., 3, 3) rotations and (..., 3) translations."""
    batch = R.shape[:-2]
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], R.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


@f32_matmul
def invert_se3(T: jax.Array) -> jax.Array:
    """Invert rigid transforms (..., 4, 4) analytically: [R t]^-1 = [R^T, -R^T t]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_se3(Rt, -(Rt @ t[..., None])[..., 0])


def compose_se3(A: jax.Array, B: jax.Array) -> jax.Array:
    """Compose transforms: returns A @ B with broadcasting."""
    return A @ B


def to_homogeneous(x: jax.Array) -> jax.Array:
    """Append a 1 to the last dimension: (..., n) -> (..., n+1).

    Mirrors reference ace_util.to_homogeneous (/root/reference/ace_util.py:16-22)
    but operates on the trailing axis.
    """
    ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
    return jnp.concatenate([x, ones], axis=-1)
