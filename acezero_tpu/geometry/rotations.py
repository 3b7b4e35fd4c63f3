"""Rotation representations and conversions, pure JAX, batch-friendly.

All functions operate on the trailing dimensions and broadcast over leading
batch dimensions, so they compose with vmap/jit without modification.

Conventions match the reference pipeline (scipy `Rotation` quaternion
semantics used by /root/reference/dataset_io.py:137-150 and the `roma`
orthonormalization used by /root/reference/refine_poses.py:135-150):
  - quaternions are stored (w, x, y, z), unit norm, either hemisphere;
  - rotation matrices are right-handed, det +1, applied as `R @ v`;
  - Rodrigues vectors are axis * angle (radians).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from acezero_tpu.utils.precision import f32_matmul

_EPS = 1e-12


def quat_wxyz_to_matrix(q: jax.Array) -> jax.Array:
    """Convert quaternions (..., 4) in (w, x, y, z) order to (..., 3, 3)."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat_wxyz(m: jax.Array) -> jax.Array:
    """Convert rotation matrices (..., 3, 3) to quaternions (..., 4) (w,x,y,z).

    Uses the branch-free Shepperd-style construction: compute all four
    candidate quaternions (one per largest component) and select the one with
    the largest pivot, which is numerically stable for every rotation.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Four squared pivots (4*w^2, 4*x^2, 4*y^2, 4*z^2), each >= 0 up to noise.
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    # Candidate quaternions, each scaled by its pivot (unnormalized).
    cand_w = jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    cand_x = jnp.stack([m21 - m12, qx2, m01 + m10, m02 + m20], axis=-1)
    cand_y = jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21], axis=-1)
    cand_z = jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz2], axis=-1)

    pivots = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)
    q = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    # Canonicalize sign (w >= 0) so round-trips are deterministic.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


@f32_matmul
def rodrigues_to_matrix(rvec: jax.Array) -> jax.Array:
    """Axis-angle vectors (..., 3) to rotation matrices (..., 3, 3).

    Taylor-safe near zero angle (used heavily by the LM pose refiner).
    """
    theta2 = jnp.sum(rvec * rvec, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    small = theta2 < 1e-8
    # sin(t)/t and (1-cos(t))/t^2 with series fallbacks.
    sin_t = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    cos_t = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS))

    kx, ky, kz = rvec[..., 0], rvec[..., 1], rvec[..., 2]
    zero = jnp.zeros_like(kx)
    K = jnp.stack(
        [zero, -kz, ky, kz, zero, -kx, -ky, kx, zero], axis=-1
    ).reshape(rvec.shape[:-1] + (3, 3))
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    return eye + sin_t[..., None, None] * K + cos_t[..., None, None] * K2


def matrix_to_rodrigues(m: jax.Array) -> jax.Array:
    """Rotation matrices (..., 3, 3) to axis-angle vectors (..., 3)."""
    q = matrix_to_quat_wxyz(m)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v = q[..., 1:]
    vnorm = jnp.linalg.norm(v, axis=-1)
    angle = 2.0 * jnp.arctan2(vnorm, w)
    scale = jnp.where(vnorm < 1e-9, 2.0, angle / jnp.maximum(vnorm, _EPS))
    return v * scale[..., None]


def rotation_angle(m: jax.Array) -> jax.Array:
    """Rotation angle in radians of matrices (..., 3, 3)."""
    tr = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    return jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0))


@f32_matmul
def special_gramschmidt(m: jax.Array) -> jax.Array:
    """Project (..., 3, 3) onto SO(3) by Gram-Schmidt of the first two columns.

    Matches `roma.special_gramschmidt` semantics (reference
    refine_poses.py:147-148): the third column is the cross product of the
    orthonormalized first two.
    """
    c0 = m[..., :, 0]
    c1 = m[..., :, 1]
    e0 = c0 / jnp.maximum(jnp.linalg.norm(c0, axis=-1, keepdims=True), _EPS)
    c1p = c1 - jnp.sum(e0 * c1, axis=-1, keepdims=True) * e0
    e1 = c1p / jnp.maximum(jnp.linalg.norm(c1p, axis=-1, keepdims=True), _EPS)
    e2 = jnp.cross(e0, e1)
    return jnp.stack([e0, e1, e2], axis=-1)


@f32_matmul
def special_procrustes(m: jax.Array) -> jax.Array:
    """Nearest rotation matrix in Frobenius norm via SVD (roma semantics)."""
    u, _, vt = jnp.linalg.svd(m, full_matrices=False)
    det = jnp.linalg.det(u @ vt)
    d = jnp.concatenate(
        [jnp.ones(m.shape[:-2] + (2,), m.dtype), det[..., None]], axis=-1
    )
    return (u * d[..., None, :]) @ vt
