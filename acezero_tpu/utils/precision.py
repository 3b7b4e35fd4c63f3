"""Matmul-precision control for small-matrix geometry on TPU.

On TPU the default matmul precision routes float32 contractions through
single-pass bfloat16 MXU passes (~1e-3 relative error). That is the right
trade for the 512-wide network matmuls, but pose algebra (3x3/4x4 products,
P3P, LM normal equations) needs true float32. Functions doing small-matrix
math wrap their bodies in `f32_matmul` so every dot/einsum they trace uses
Precision.HIGHEST, independent of the caller's global setting.
"""

from __future__ import annotations

import functools

import jax

HIGHEST = jax.lax.Precision.HIGHEST


def f32_matmul(fn):
    """Decorator: trace the function body under highest matmul precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
