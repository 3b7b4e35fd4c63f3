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

    def body(state, _):
        # Deferred accept/reject: exactly ONE residual+Jacobian evaluation
        # per iteration (sequential op depth is what registration latency is
        # made of on TPU). The cost of the *current* params decides whether
        # the previous step gets kept or rolled back to `best`.
        rvec, tvec, lam, best = state
        res, J = _residuals_and_jacobian(rvec, tvec, world_pts, target_px, focal, ppx, ppy)
        cost = jnp.sum(weights * jnp.sum(res * res, axis=-1)) / wsum

        w = weights[:, None]
        Jw = J * w[..., None]
        JtJ = jnp.einsum("nri,nrj->ij", Jw, J)
        Jtr = jnp.einsum("nri,nr->i", Jw, res)

        improved = cost < best["cost"]
        pick = lambda new, old: jnp.where(improved, new, old)
        best = {
            "cost": pick(cost, best["cost"]),
            "rvec": pick(rvec, best["rvec"]),
            "tvec": pick(tvec, best["tvec"]),
            "JtJ": jnp.where(improved, JtJ, best["JtJ"]),
            "Jtr": jnp.where(improved, Jtr, best["Jtr"]),
        }
        lam = jnp.clip(jnp.where(improved, lam * 0.33, lam * 10.0), 1e-8, 1e6)

        # step from the best evaluated point's normal equations (rejected
        # steps revert, then retry with stronger damping) — exact LM at one
        # residual/Jacobian evaluation per iteration
        A = best["JtJ"] + lam * jnp.diag(jnp.maximum(jnp.diag(best["JtJ"]), 1e-6))
        dx = -jnp.linalg.solve(A, best["Jtr"])

        # compose: left-perturbation on rotation (t is the fixed pivot of the
        # perturbation model in _residuals_and_jacobian), additive on t
        dR = rodrigues_to_matrix(dx[:3])
        rvec_new = matrix_to_rodrigues(dR @ rodrigues_to_matrix(best["rvec"]))
        t_new = best["tvec"] + dx[3:]
        return (rvec_new, t_new, lam, best), None

    big = jnp.asarray(jnp.inf, jnp.float32)
    best0 = {
        "cost": big,
        "rvec": rvec0,
        "tvec": tvec0,
        "JtJ": jnp.eye(6, dtype=jnp.float32),
        "Jtr": jnp.zeros(6, jnp.float32),
    }
    state0 = (rvec0, tvec0, jnp.asarray(1e-3, jnp.float32), best0)
    (_, _, _, best), _ = jax.lax.scan(body, state0, None, length=iterations + 1)
    return best["rvec"], best["tvec"], best["cost"]
