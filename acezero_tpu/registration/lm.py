"""Weighted Levenberg–Marquardt PnP, fixed-shape, pure JAX.

Replaces the reference's per-frame `cv::solvePnP(SOLVEPNP_ITERATIVE)` refits
inside `refineHyp` (/root/reference/dsacstar/dsacstar_util.h:522-597) with a
fixed-iteration damped Gauss-Newton solve over a *masked* point set: inlier
selection becomes a weight vector instead of a gather, so the whole
refinement loop is static-shape and batches over frames × hypotheses.

Pose parametrization: world-to-camera as (rodrigues rvec, translation t),
`p_cam = R(rvec) @ p_world + t` — the same convention as OpenCV pose vectors
in the reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from acezero_tpu.geometry.rotations import matrix_to_rodrigues, rodrigues_to_matrix
from acezero_tpu.utils.precision import f32_matmul

_EPS = 1e-12


@f32_matmul
def reprojection_errors(
    rvec: jax.Array,
    tvec: jax.Array,
    world_pts: jax.Array,
    target_px: jax.Array,
    focal: jax.Array,
    ppx: jax.Array,
    ppy: jax.Array,
    max_error: float = 100.0,
) -> jax.Array:
    """Euclidean reprojection error per point, clamped at `max_error`.

    Mirrors `getReproErrs` (/root/reference/dsacstar/dsacstar_util.h:356-446):
    the error image is clamped at maxReproj (default 100 px) for stability.
    Points behind the camera project through OpenCV-style central projection
    (no clamping of z) but end up with large clamped errors, like the C++.

    Shapes: world_pts (n, 3), target_px (n, 2) -> (n,).
    """
    R = rodrigues_to_matrix(rvec)
    p_cam = world_pts @ R.T + tvec
    z = p_cam[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = focal * p_cam[..., 0] / z_safe + ppx
    v = focal * p_cam[..., 1] / z_safe + ppy
    err = jnp.sqrt(
        (u - target_px[..., 0]) ** 2 + (v - target_px[..., 1]) ** 2 + _EPS
    )
    # points behind the camera are never inliers: force max error
    err = jnp.where(z > 1e-9, err, max_error)
    return jnp.minimum(err, max_error)


@f32_matmul
def _residuals_and_jacobian(rvec, tvec, world_pts, target_px, focal, ppx, ppy):
    """Per-point 2D residuals and their 6-DOF Jacobian.

    Returns residuals (n, 2) and J (n, 2, 6) wrt (rvec, tvec), using the
    standard chain rule through `p_cam = R p + t` with the left-multiplied
    rotation-perturbation Jacobian d(p_cam)/d(rvec_delta) = -[p_cam - t]_x
    evaluated by composing delta on the left: R' = dR(delta) R. Solving in
    this local frame avoids the exact (complicated) d(Rodrigues)/d(rvec) and
    converges identically; the update is composed accordingly by `lm_pnp`.
    """
    R = rodrigues_to_matrix(rvec)
    p_cam = world_pts @ R.T + tvec
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    inv_z = 1.0 / z_safe

    u = focal * x * inv_z + ppx
    v = focal * y * inv_z + ppy
    res = jnp.stack([u - target_px[..., 0], v - target_px[..., 1]], axis=-1)

    # d(u,v)/d(p_cam): (n, 2, 3)
    zero = jnp.zeros_like(x)
    du = jnp.stack([focal * inv_z, zero, -focal * x * inv_z * inv_z], axis=-1)
    dv = jnp.stack([zero, focal * inv_z, -focal * y * inv_z * inv_z], axis=-1)
    d_px_d_pcam = jnp.stack([du, dv], axis=-2)

    # d(p_cam)/d(delta_r) for left-perturbation R' = exp([delta]x) R:
    # p_cam' = exp([delta]x)(p_cam - t) + t  =>  d/d(delta) = -[(p_cam - t)]_x
    pc = p_cam - tvec
    px_, py_, pz_ = pc[..., 0], pc[..., 1], pc[..., 2]
    neg_skew = jnp.stack(
        [
            jnp.stack([zero, pz_, -py_], axis=-1),
            jnp.stack([-pz_, zero, px_], axis=-1),
            jnp.stack([py_, -px_, zero], axis=-1),
        ],
        axis=-2,
    )  # (n, 3, 3)

    J_r = d_px_d_pcam @ neg_skew  # (n, 2, 3)
    J_t = d_px_d_pcam  # (n, 2, 3)
    J = jnp.concatenate([J_r, J_t], axis=-1)  # (n, 2, 6)
    return res, J


@partial(jax.jit, static_argnames=("iterations",))
@f32_matmul
def lm_pnp(
    rvec0: jax.Array,
    tvec0: jax.Array,
    world_pts: jax.Array,
    target_px: jax.Array,
    weights: jax.Array,
    focal: jax.Array,
    ppx: jax.Array,
    ppy: jax.Array,
    iterations: int = 10,
):
    """Damped Gauss-Newton PnP over a weighted point set.

    Args:
      rvec0, tvec0: initial world-to-camera pose (rodrigues, translation).
      world_pts: (n, 3); target_px: (n, 2); weights: (n,) >= 0 (0 masks out).
      iterations: fixed LM iteration count (jit static).

    Returns:
      (rvec, tvec, cost): refined pose and final weighted mean residual cost.
    """
    wsum = jnp.maximum(jnp.sum(weights), 1e-9)

    def cost_of(rvec, tvec):
        res, _ = _residuals_and_jacobian(rvec, tvec, world_pts, target_px, focal, ppx, ppy)
        return jnp.sum(weights * jnp.sum(res * res, axis=-1)) / wsum

    def body(state, _):
        rvec, tvec, lam, cost = state
        res, J = _residuals_and_jacobian(rvec, tvec, world_pts, target_px, focal, ppx, ppy)
        w = weights[:, None]
        # normal equations: (J^T W J + lam I) dx = -J^T W r
        Jw = J * w[..., None]
        JtJ = jnp.einsum("nri,nrj->ij", Jw, J)
        Jtr = jnp.einsum("nri,nr->i", Jw, res)
        A = JtJ + lam * jnp.diag(jnp.maximum(jnp.diag(JtJ), 1e-6))
        dx = -jnp.linalg.solve(A, Jtr)

        # compose: left-perturbation on rotation (t is the fixed pivot of the
        # perturbation model in _residuals_and_jacobian), additive on t
        dR = rodrigues_to_matrix(dx[:3])
        R_new = dR @ rodrigues_to_matrix(rvec)
        t_new = tvec + dx[3:]
        rvec_new = matrix_to_rodrigues(R_new)
        new_cost = cost_of(rvec_new, t_new)

        improved = new_cost < cost
        rvec = jnp.where(improved, rvec_new, rvec)
        tvec = jnp.where(improved, t_new, tvec)
        cost_out = jnp.where(improved, new_cost, cost)
        lam = jnp.where(improved, lam * 0.33, lam * 10.0)
        lam = jnp.clip(lam, 1e-8, 1e6)
        return (rvec, tvec, lam, cost_out), None

    init_cost = cost_of(rvec0, tvec0)
    (rvec, tvec, _, cost), _ = jax.lax.scan(
        body, (rvec0, tvec0, jnp.asarray(1e-3, jnp.float32), init_cost), None, length=iterations
    )
    return rvec, tvec, cost
