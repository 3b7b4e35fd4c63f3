"""Shared canvas-content geometry (single source of truth).

Content of size (h, w) is placed on the (H, W) canvas at integer offsets
y0 = (H - h) // 2, x0 = (W - w) // 2 (data/images.py and native/canvas.cpp).
The validity mask and any principal-point logic must use the same floor
convention — a float (H - h) / 2 bound marks one padding row as valid and
drops one content row whenever the margin is odd.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def content_mask(H: int, W: int, sizes: jax.Array) -> jax.Array:
    """(B, H, W) bool masks of the centered content rectangles.

    sizes: (B, 2) int32 content (h, w).
    """
    hh = sizes[:, 0][:, None, None]
    ww = sizes[:, 1][:, None, None]
    y0 = (H - hh) // 2
    x0 = (W - ww) // 2
    yy = jnp.arange(H, dtype=sizes.dtype)[None, :, None]
    xx = jnp.arange(W, dtype=sizes.dtype)[None, None, :]
    return (yy >= y0) & (yy < y0 + hh) & (xx >= x0) & (xx < x0 + ww)
