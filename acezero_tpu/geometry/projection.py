"""Pinhole projection utilities, pure JAX.

Semantics mirror the reference:
  - pixel grid targets at subsampled cell centers, `sub * (idx + 0.5)`
    (/root/reference/ace_util.py:7-13 and dsacstar createSampling,
    /root/reference/dsacstar/dsacstar_util.h:59-76 — both identical for
    subsampling 8: x*8+4);
  - intrinsics are [[f,0,cx],[0,f,cy],[0,0,1]] with principal point at the
    image center (/root/reference/dataset.py:406-412).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from acezero_tpu.utils.precision import f32_matmul

OUTPUT_SUBSAMPLE = 8  # encoder stride; reference ace_network.py:159


def get_pixel_grid(h: int, w: int, subsample: int = OUTPUT_SUBSAMPLE) -> jax.Array:
    """Target pixel positions (h, w, 2) = (x, y) for subsampled predictions."""
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * subsample
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * subsample
    xx, yy = jnp.meshgrid(xs, ys)  # both (h, w)
    return jnp.stack([xx, yy], axis=-1)


def make_intrinsics(focal: jax.Array, cx: jax.Array, cy: jax.Array) -> jax.Array:
    """Build (..., 3, 3) K matrices from scalar focal length and principal point."""
    focal, cx, cy = jnp.broadcast_arrays(
        jnp.asarray(focal, jnp.float32), jnp.asarray(cx, jnp.float32), jnp.asarray(cy, jnp.float32)
    )
    zero = jnp.zeros_like(focal)
    one = jnp.ones_like(focal)
    K = jnp.stack(
        [focal, zero, cx, zero, focal, cy, zero, zero, one], axis=-1
    )
    return K.reshape(focal.shape + (3, 3))


@f32_matmul
def project_points(
    points_w: jax.Array,
    pose_w2c: jax.Array,
    K: jax.Array,
    min_depth: float = 0.1,
):
    """Project world points into the image.

    Args:
      points_w: (..., 3) world-space points.
      pose_w2c: broadcastable (..., 4, 4) or (4, 4) world-to-camera transform.
      K: broadcastable (..., 3, 3) or (3, 3) intrinsics.
      min_depth: clamp for the projective division (reference
        ace_trainer.py:542-548 clamps z at depth_min before dehomogenizing).

    Returns:
      (px, depth): pixel coordinates (..., 2) and signed camera-space depth
      (...,). Pixels for points behind the camera are invalid by construction;
      callers mask on `depth`.
    """
    R = pose_w2c[..., :3, :3]
    t = pose_w2c[..., :3, 3]
    p_cam = jnp.einsum("...ij,...j->...i", R, points_w) + t
    depth = p_cam[..., 2]
    z = jnp.maximum(depth, min_depth)
    f = K[..., 0, 0]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    px = jnp.stack(
        [f * p_cam[..., 0] / z + cx, f * p_cam[..., 1] / z + cy], axis=-1
    )
    return px, depth


@f32_matmul
def backproject_depth(
    depth: jax.Array,
    focal: jax.Array,
    cx: jax.Array,
    cy: jax.Array,
    pose_c2w: jax.Array,
    pixel_grid: jax.Array,
):
    """Lift a (subsampled) depth map to world-space scene coordinates.

    Mirrors the seed-initialization math of the reference dataset
    (/root/reference/dataset.py:347-389): pixels at subsampled grid centers
    are unprojected with the shared focal length and image-center principal
    point, then transformed by the cam-to-world pose. Cells with depth == 0 or
    depth > 1000 yield all-zero coordinates (the "no target" marker).

    Args:
      depth: (h, w) metric depth at subsampled resolution.
      focal: scalar focal length (image pixels).
      cx, cy: principal point (image pixels).
      pose_c2w: (4, 4) camera-to-world.
      pixel_grid: (h, w, 2) full-resolution pixel positions of the cells.

    Returns:
      (h, w, 3) world coordinates, zeros where depth is invalid.
    """
    x = (pixel_grid[..., 0] - cx) / focal * depth
    y = (pixel_grid[..., 1] - cy) / focal * depth
    p_cam = jnp.stack([x, y, depth], axis=-1)
    R = pose_c2w[:3, :3]
    t = pose_c2w[:3, 3]
    p_world = jnp.einsum("ij,hwj->hwi", R, p_cam) + t
    valid = (depth > 0) & (depth <= 1000.0)
    return jnp.where(valid[..., None], p_world, 0.0)
