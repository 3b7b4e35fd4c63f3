"""Kabsch/Umeyama point-set alignment, pure JAX, mask-aware.

Semantics match the reference implementation used for pose-set alignment
(/root/reference/eval_poses_util.py:20-45), including its scale estimate
`scale = mean(|c2|^2) / trace(diag(S) @ correction)` which maps points from
set 1 onto set 2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from acezero_tpu.utils.precision import f32_matmul


@f32_matmul
def kabsch_umeyama(
    pts1: jax.Array,
    pts2: jax.Array,
    weights: jax.Array | None = None,
    estimate_scale: bool = False,
):
    """Find T (4x4) and scale s such that `s * R @ p1 + t ~= p2`.

    Args:
      pts1: (n, 3) source points.
      pts2: (n, 3) target points.
      weights: optional (n,) non-negative weights (0 masks a row out). Enables
        fixed-shape RANSAC refinement over inlier subsets.
      estimate_scale: also estimate a similarity scale (reference
        eval_poses_util.py:32-36).

    Returns:
      (T, scale): T is (4, 4) with T[:3, :3] = s * R (scale folded in, exactly
      as the reference composes it), scale is a scalar.
    """
    n = pts1.shape[0]
    if weights is None:
        weights = jnp.ones((n,), pts1.dtype)
    wsum = jnp.maximum(jnp.sum(weights), 1e-9)
    w = (weights / wsum)[:, None]

    mu1 = jnp.sum(pts1 * w, axis=0)
    mu2 = jnp.sum(pts2 * w, axis=0)
    c1 = pts1 - mu1
    c2 = pts2 - mu2

    cov = (c1 * w).T @ c2  # weighted covariance, matches /n of the reference
    u, s, vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(vt.T @ u.T))
    corr = jnp.array([1.0, 1.0, 0.0]) + jnp.array([0.0, 0.0, 1.0]) * d

    if estimate_scale:
        pts_var = jnp.sum(jnp.sum(c2 * c2, axis=-1) * w[:, 0])
        scale = pts_var / jnp.maximum(jnp.sum(s * corr), 1e-12)
    else:
        scale = jnp.asarray(1.0, pts1.dtype)

    R = scale * (vt.T * corr[None, :]) @ u.T
    t = mu2 - R @ mu1

    T = jnp.eye(4, dtype=pts1.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t)
    return T, scale
