"""On-device image augmentation: photometric jitter + affine scale/rotation.

TPU-first replacement for the reference's per-CPU-worker skimage pipeline
(/root/reference/dataset.py:144-163,321-343). A single affine warp about the
canvas center implements both the scale jitter (reference: resize to
short_size * s, s ~ U[1/1.5, 1.5]) and the in-plane rotation (±15 deg), with
the supervision adjusted self-consistently:

  - effective focal length: f' = s * f  (content magnified in place, the
    canvas stays static instead of growing with s);
  - effective world-to-camera pose: T' = Rz(theta) @ T, because rotating
    image coordinates about the principal point equals rotating the camera
    about its optical axis (the reference stores the same compensation as
    `pose_rot`, dataset.py:336-343);
  - masks and scene-coordinate target maps warp with the same transform
    (nearest-neighbor for targets, zeros marking invalid — the reference
    rotates depth maps with order=0, dataset.py:331-334).

Note one deliberate deviation: the reference grows the image buffer for
s > 1, while we keep the static canvas, which center-crops magnified
content. Patch sampling still draws the same 1024 samples/image, now from
the central region at high scales; border content is covered by the s < 1
draws across the ~10 buffer passes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from acezero_tpu.data.canvas_geom import content_mask
from acezero_tpu.data.images import GRAY_MEAN, GRAY_STD
from acezero_tpu.data.warp import affine_warp_batch


def normalize_images(images_u8: jax.Array) -> jax.Array:
    """uint8 (N, H, W) -> normalized float32 (N, H, W, 1)."""
    x = images_u8.astype(jnp.float32) / 255.0
    x = (x - GRAY_MEAN) / GRAY_STD
    return x[..., None]


def _affine_sample(img: jax.Array, inv_A: jax.Array, inv_b: jax.Array, order: int):
    """Inverse-warp one (H, W) or (H, W, C) image: out(p) = img(inv_A p + b)."""
    h, w = img.shape[0], img.shape[1]
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    # pixel coordinates: (x, y) order in the affine, evaluated at +0.5 centers
    xs = xx + 0.5
    ys = yy + 0.5
    src_x = inv_A[0, 0] * xs + inv_A[0, 1] * ys + inv_b[0] - 0.5
    src_y = inv_A[1, 0] * xs + inv_A[1, 1] * ys + inv_b[1] - 0.5
    coords = [jnp.broadcast_to(src_y, (h, w)), jnp.broadcast_to(src_x, (h, w))]
    if img.ndim == 2:
        return jax.scipy.ndimage.map_coordinates(img, coords, order=order, mode="constant", cval=0.0)
    out = [
        jax.scipy.ndimage.map_coordinates(img[..., c], coords, order=order, mode="constant", cval=0.0)
        for c in range(img.shape[-1])
    ]
    return jnp.stack(out, axis=-1)


def _inverse_affine(theta: jax.Array, scale: jax.Array, center_xy: jax.Array):
    """Inverse of p' = R(theta) * s * (p - c) + c, as (A, b): p = A p' + b."""
    cos = jnp.cos(-theta) / scale
    sin = jnp.sin(-theta) / scale
    A = jnp.array([[cos, -sin], [sin, cos]])
    b = center_xy - A @ center_xy
    return A, b


@partial(
    jax.jit,
    static_argnames=(
        "aug_rotation_deg",
        "aug_scale_min",
        "aug_scale_max",
        "aug_black_white",
        "enabled",
    ),
)
def augment_batch(
    key: jax.Array,
    images_u8: jax.Array,
    sizes: jax.Array,
    aug_rotation_deg: jax.Array,
    aug_scale_min: jax.Array,
    aug_scale_max: jax.Array,
    aug_black_white: jax.Array = 0.1,
    enabled: bool = True,
):
    """Photometric + geometric augmentation of a canvas batch.

    Args:
      images_u8: (N, H, W) uint8 canvases.
      sizes: (N, 2) int32 real content (h, w) — defines the valid mask.
      aug_*: augmentation ranges (rotation in degrees, scale multiplicative).

    Returns:
      dict with images (N, H, W, 1) normalized float32, masks (N, H, W) bool,
      thetas (N,) radians, scales (N,) — for intrinsic/pose compensation —
      and `warp_params` reusable to warp supervision maps.
    """
    n, h, w = images_u8.shape
    center = jnp.array([w / 2.0, h / 2.0], jnp.float32)

    k_theta, k_scale, k_bright, k_contrast = jax.random.split(key, 4)
    if enabled:
        thetas = (
            jax.random.uniform(k_theta, (n,), minval=-1.0, maxval=1.0)
            * aug_rotation_deg
            * jnp.pi
            / 180.0
        )
        scales = jax.random.uniform(
            k_scale, (n,), minval=aug_scale_min, maxval=aug_scale_max
        )
        brightness = jax.random.uniform(
            k_bright, (n,), minval=1.0 - aug_black_white, maxval=1.0 + aug_black_white
        )
        contrast = jax.random.uniform(
            k_contrast, (n,), minval=1.0 - aug_black_white, maxval=1.0 + aug_black_white
        )
    else:
        thetas = jnp.zeros((n,))
        scales = jnp.ones((n,))
        brightness = jnp.ones((n,))
        contrast = jnp.ones((n,))

    x = images_u8.astype(jnp.float32) / 255.0

    # content masks from sizes (content is centered on the canvas; shares
    # the integer-floor placement convention with decode_to_canvas)
    base_mask = content_mask(h, w, sizes)

    # photometric: brightness scale then torchvision-style contrast blend
    mean_per_img = jnp.sum(x * base_mask, axis=(1, 2)) / jnp.maximum(
        jnp.sum(base_mask, axis=(1, 2)), 1.0
    )
    x = x * brightness[:, None, None]
    x = x * contrast[:, None, None] + (1.0 - contrast[:, None, None]) * mean_per_img[:, None, None]
    x = jnp.clip(x, 0.0, 1.0)
    x = (x - GRAY_MEAN) / GRAY_STD

    # gather-free batched warp (see data/warp.py): two-pass Catmull-Smith —
    # per-image MXU resize matmuls + barrel-shift shears, no map_coordinates
    if enabled and (aug_rotation_deg > 0.0 or aug_scale_max > aug_scale_min):
        images = affine_warp_batch(
            x, thetas, scales, float(aug_rotation_deg), float(aug_scale_max)
        )
    else:
        images = x

    def mask_one(size_hw, theta, scale):
        # the warped mask is the affine image of the content rectangle —
        # test source coordinates analytically instead of resampling a mask
        # image (gathers/extra passes are the expensive part on TPU)
        A, b = _inverse_affine(theta, scale, center)
        yy = jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5
        xx = jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5
        src_x = A[0, 0] * xx + A[0, 1] * yy + b[0]
        src_y = A[1, 0] * xx + A[1, 1] * yy + b[1]
        y0 = ((h - size_hw[0]) // 2).astype(jnp.float32)
        x0 = ((w - size_hw[1]) // 2).astype(jnp.float32)
        # half-pixel shrink so bilinear samples never blend padding in
        return (
            (src_y >= y0 + 0.5)
            & (src_y <= y0 + size_hw[0].astype(jnp.float32) - 0.5)
            & (src_x >= x0 + 0.5)
            & (src_x <= x0 + size_hw[1].astype(jnp.float32) - 0.5)
        )

    masks = jax.vmap(mask_one)(sizes, thetas, scales)
    # zero out padding so the encoder sees a constant background
    images = jnp.where(masks, images, 0.0)

    return {
        "images": images[..., None],
        "masks": masks,
        "thetas": thetas,
        "scales": scales,
    }


def warp_target_map(
    target_hw_c: jax.Array,
    theta: jax.Array,
    scale: jax.Array,
    subsample: int = 8,
) -> jax.Array:
    """Warp a subsampled supervision map (h, w, C) with the image's affine.

    Uses nearest-neighbor sampling (order 0) so the all-zero "invalid" marker
    never bleeds. The affine is expressed in subsampled-cell units; rotation/
    scale about the canvas center commutes with the uniform subsampling.
    """
    h, w = target_hw_c.shape[:2]
    center = jnp.array([w / 2.0, h / 2.0], jnp.float32)
    A, b = _inverse_affine(theta, scale, center)
    return _affine_sample(target_hw_c, A, b, order=0)
