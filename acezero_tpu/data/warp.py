"""Gather-free affine image warp (rotation + uniform scale about the center).

TPU gathers are the reason the round-1 augmentation warp cost ~29 ms/image:
`jax.scipy.ndimage.map_coordinates` lowers to 4 dense HBM gathers per bilinear
sample, and the TPU has no gather unit. This module re-expresses the same
inverse warp `out(p) = img(R(-theta)/s (p - c) + c)` as a two-pass
Catmull-Smith separable resampling in which every step is either

  - a per-image dense 1-D interpolation matrix applied on the MXU (the
    uniform-scale part of each pass; antialiased triangle filter when
    minifying, bilinear otherwise), or
  - a "barrel shifter": a per-row (resp. per-column) fractional translation
    realized as ceil(log2(K)) stages of static slices + selects over a
    zero-padded canvas, where K bounds the integer shift range. No dynamic
    indexing anywhere; everything is VPU select/madd work on static shapes.

Decomposition (A = R(-theta)/s is the inverse-map matrix, c the center):
  pass 1 (x): u(x, y') = alpha*(x+.5-cx) + beta*(y'+.5-cy) + cx - .5
  pass 2 (y): v(x, y)  = A21*(x+.5-cx) + A22*(y+.5-cy) + cy - .5
with beta = A12/A22 and alpha = det(A)/A22, which for A = R(-theta)/s gives
  alpha = 1/(s cos t), shift-slope_1 = beta/alpha = s sin t,
  resize_2 = A22 = cos t / s, shift-slope_2 = A21/A22 = -tan t.
Composition is exact: out[y, x] = img[v, alpha*(x̃) + beta*(v+.5-cy) + cx-.5]
reproduces A exactly (the shear coefficient is evaluated at the *resampled*
row, the classic Catmull-Smith correction).

The Catmull-Smith bottleneck (pass-1 collapse) only occurs near 90 deg;
the augmentation range is +-15 deg (reference /root/reference/dataset.py:
321-343), where the decomposition is well-conditioned.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _resize_matrix(
    n_out: int,
    n_in: int,
    scale: jax.Array,
    center: jax.Array,
    offset: int = 0,
    max_aw: int = 2,
) -> jax.Array:
    """(n_out, n_in) 1-D interpolation matrix: out[i] = sum_j M[i, j] src[j].

    Output index i represents coordinate (i - offset); it samples source
    coordinate scale*(i - offset + .5 - center) + center. `offset` lets the
    output canvas extend past the source extent on both sides (the barrel
    shear after the resize reads up to its shift range beyond the nominal
    canvas — without the extension, magnified content gets clipped).

    Triangle filter of half-width max(1, scale): bilinear when magnifying,
    antialiased averaging when minifying (scale > 1 means the inverse map
    strides over the source, i.e. the content is shrunk on the canvas).

    Normalization runs over a virtually extended tap range (max_aw extra taps
    each side) so that taps falling outside the image keep their weight but
    contribute zeros — matching map_coordinates' mode='constant' boundary
    instead of stretching edge pixels.
    """
    i = jnp.arange(n_out, dtype=jnp.float32) + 0.5 - offset
    src = scale * (i - center) + center
    j = jnp.arange(-max_aw, n_in + max_aw, dtype=jnp.float32) + 0.5
    aw = jnp.maximum(scale, 1.0)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(src[:, None] - j[None, :]) / aw)
    w = w / jnp.maximum(w.sum(axis=-1, keepdims=True), 1e-8)
    return w[:, max_aw : max_aw + n_in]


def _barrel_shift_last(arr: jax.Array, shift: jax.Array, pad: int) -> jax.Array:
    """out[..., x] = arr[..., x + shift] (bilinear, zeros outside).

    arr: (B, H, W); shift: (B, H) real-valued in [-pad, pad]. The integer
    part routes through ceil(log2(2*pad)) select stages of static slices;
    the fractional part is one final blend.
    """
    B, H, W = arr.shape
    K = 2 * pad
    arr_p = jnp.pad(arr, ((0, 0), (0, 0), (pad, pad + 1)))
    t = jnp.clip(shift + pad, 0.0, float(K))
    k = jnp.floor(t).astype(jnp.int32)
    frac = (t - k.astype(jnp.float32))[..., None]
    cur = arr_p
    for s_bit in range(max(1, K.bit_length())):
        d = 1 << s_bit
        shifted = jnp.concatenate(
            [cur[..., d:], jnp.zeros_like(cur[..., :d])], axis=-1
        )
        take = (((k >> s_bit) & 1) == 1)[..., None]
        cur = jnp.where(take, shifted, cur)
    return (1.0 - frac) * cur[..., :W] + frac * cur[..., 1 : W + 1]


def _barrel_shift_rows(arr: jax.Array, shift: jax.Array, pad: int) -> jax.Array:
    """out[:, y, x] = arr[:, y + shift[:, x], x] (bilinear, zeros outside)."""
    B, H, W = arr.shape
    K = 2 * pad
    arr_p = jnp.pad(arr, ((0, 0), (pad, pad + 1), (0, 0)))
    t = jnp.clip(shift + pad, 0.0, float(K))
    k = jnp.floor(t).astype(jnp.int32)
    frac = (t - k.astype(jnp.float32))[:, None, :]
    kb = k[:, None, :]
    cur = arr_p
    for s_bit in range(max(1, K.bit_length())):
        d = 1 << s_bit
        shifted = jnp.concatenate(
            [cur[:, d:, :], jnp.zeros_like(cur[:, :d, :])], axis=1
        )
        take = ((kb >> s_bit) & 1) == 1
        cur = jnp.where(take, shifted, cur)
    return (1.0 - frac) * cur[:, :H, :] + frac * cur[:, 1 : H + 1, :]


def affine_warp_batch(
    x: jax.Array,
    thetas: jax.Array,
    scales: jax.Array,
    max_rot_deg: float,
    max_scale: float,
) -> jax.Array:
    """Warp a batch: out(p) = x(R(-theta)/s (p - c) + c), zeros outside.

    Args:
      x: (B, H, W) float images.
      thetas: (B,) rotation angles (radians), |theta| <= max_rot_deg.
      scales: (B,) uniform content scales, <= max_scale.
      max_rot_deg, max_scale: STATIC bounds — they size the shift stages and
        pads; exceeding them clamps the shift (content clipping, not error).

    Matches `map_coordinates(order=1, mode='constant')` semantics up to the
    extra interpolation pass (sub-1% smoothing on natural images).
    """
    B, H, W = x.shape
    cx, cy = W / 2.0, H / 2.0
    max_rot = math.radians(max_rot_deg) + 1e-6
    max_scale_for_shift = max(1.0, max_scale)

    cos_t = jnp.cos(thetas)
    sin_t = jnp.sin(thetas)
    inv_s = 1.0 / scales
    # inverse-map matrix A = R(-theta)/s
    a22 = cos_t * inv_s
    alpha = inv_s / cos_t  # det(A)/A22 = 1/(s cos t)
    slope1 = scales * sin_t  # beta/alpha = s sin t
    slope2 = -sin_t / cos_t  # A21/A22 = -tan t

    # static pads for the barrel shifters (worst case over the aug ranges)
    pad1 = int(math.ceil(max_scale_for_shift * math.sin(max_rot) * (H / 2.0))) + 2
    pad2 = int(math.ceil(math.tan(max_rot) * (W / 2.0))) + 2

    # ---- pass 1: resample along x -----------------------------------------
    # the resized canvas extends pad1 columns past each edge: the shear that
    # follows reads up to |shift1| <= pad1 beyond the nominal width, and for
    # magnifying scales that data is real content, not padding
    Wx = jax.vmap(
        lambda a: _resize_matrix(W + 2 * pad1, W, a, jnp.asarray(cx), offset=pad1)
    )(alpha)  # (B, W + 2*pad1, W)
    r1 = jnp.einsum("bij,bhj->bhi", Wx, x, precision="highest")
    yy = jnp.arange(H, dtype=jnp.float32) + 0.5
    # the x-resize rescales column indices by alpha, so a source-coordinate
    # shift of beta*(y-cy) is beta/alpha * (y-cy) = slope1*(y-cy) resized cols
    shift1 = slope1[:, None] * (yy[None, :] - cy)
    q1 = _barrel_shift_last(r1, shift1, pad1)[..., pad1 : pad1 + W]

    # ---- pass 2: resample along y -----------------------------------------
    Wy = jax.vmap(
        lambda a: _resize_matrix(H + 2 * pad2, H, a, jnp.asarray(cy), offset=pad2)
    )(a22)  # (B, H + 2*pad2, H)
    r2 = jnp.einsum("bij,bjx->bix", Wy, q1, precision="highest")
    xx = jnp.arange(W, dtype=jnp.float32) + 0.5
    # the y-resize rescales row indices by a22; a source row shift of
    # A21*(x-cx) is A21*(x-cx)/a22 = slope2*(x-cx) resized rows
    shift2 = slope2[:, None] * (xx[None, :] - cx)
    return _barrel_shift_rows(r2, shift2, pad2)[:, pad2 : pad2 + H, :]
