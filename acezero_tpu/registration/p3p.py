"""Batched minimal perspective-three-point solver, pure JAX.

Replaces the per-frame OpenCV `solvePnP(SOLVEPNP_P3P)` calls inside the
reference DSAC* hypothesis sampler (/root/reference/dsacstar/dsacstar_util.h:
135-221) with a fixed-shape, vmap-friendly pipeline:

  1. Grunert's reduction of the three-point pose problem to a quartic in the
     ratio of point distances;
  2. a closed-form Ferrari quartic solve with Newton polishing (TPUs have no
     nonsymmetric eigensolver, and float32 closed forms alone are too noisy);
  3. camera-frame point reconstruction + 3-point Kabsch for the rigid pose;
  4. candidate disambiguation using a 4th point, exactly like OpenCV's
     4-point SOLVEPNP_P3P usage in the reference sampler.

Everything returns fixed-size candidate arrays with validity masks — no
data-dependent shapes — so hypotheses × frames batch onto the VPU/MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from acezero_tpu.utils.precision import f32_matmul

_EPS = 1e-12


def _solve_cubic_largest_real(b: jax.Array, c: jax.Array, d: jax.Array) -> jax.Array:
    """Largest real root of m^3 + b m^2 + c m + d = 0 (trigonometric method).

    Element-wise over any batch shape. Always returns a real root (a cubic
    has at least one); for the three-real-root case returns the largest.
    """
    # depressed cubic t^3 + p t + q with m = t - b/3
    p = c - b * b / 3.0
    q = 2.0 * b * b * b / 27.0 - b * c / 3.0 + d

    disc = (q / 2.0) ** 2 + (p / 3.0) ** 3

    # three-real-roots branch (disc <= 0): trig formula, take k giving max root
    safe_p = jnp.minimum(p, -_EPS)
    rho = jnp.sqrt(jnp.maximum(-safe_p / 3.0, _EPS))
    arg = jnp.clip(3.0 * q / (2.0 * safe_p * rho), -1.0, 1.0)
    theta = jnp.arccos(arg) / 3.0
    t_trig = 2.0 * rho * jnp.cos(theta)  # k=0 gives the largest root

    # one-real-root branch (disc > 0): Cardano
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    u = jnp.cbrt(-q / 2.0 + sq)
    v = jnp.cbrt(-q / 2.0 - sq)
    t_card = u + v

    t = jnp.where(disc > 0, t_card, t_trig)
    return t - b / 3.0


def solve_quartic(coeffs: jax.Array):
    """Real roots of c4 x^4 + c3 x^3 + c2 x^2 + c1 x + c0 = 0.

    Args:
      coeffs: (..., 5) coefficients ordered [c4, c3, c2, c1, c0].

    Returns:
      (roots, valid): (..., 4) roots and (..., 4) boolean mask of real ones.
      Ferrari closed form followed by 3 Newton iterations on the original
      quartic to recover float32 accuracy.
    """
    c4, c3, c2, c1, c0 = (coeffs[..., i] for i in range(5))
    scale = jnp.where(jnp.abs(c4) < _EPS, 1.0, c4)
    b = c3 / scale
    c = c2 / scale
    d = c1 / scale
    e = c0 / scale

    # depressed quartic y^4 + p y^2 + q y + r, x = y - b/4
    b2 = b * b
    p = c - 3.0 * b2 / 8.0
    q = d - b * c / 2.0 + b2 * b / 8.0
    r = e - b * d / 4.0 + b2 * c / 16.0 - 3.0 * b2 * b2 / 256.0

    # resolvent cubic 8m^3 + 8p m^2 + (2p^2 - 8r) m - q^2 = 0
    m = _solve_cubic_largest_real(p, (2.0 * p * p - 8.0 * r) / 8.0, -(q * q) / 8.0)
    m = jnp.maximum(m, 1e-10)

    s = jnp.sqrt(2.0 * m)
    t0 = p / 2.0 + m
    t1 = q / (2.0 * s)

    # quadratic 1: y^2 - s y + (t0 + t1) = 0 ; quadratic 2: y^2 + s y + (t0 - t1) = 0
    disc1 = s * s - 4.0 * (t0 + t1)
    disc2 = s * s - 4.0 * (t0 - t1)
    sq1 = jnp.sqrt(jnp.maximum(disc1, 0.0))
    sq2 = jnp.sqrt(jnp.maximum(disc2, 0.0))

    roots = jnp.stack(
        [
            (s + sq1) / 2.0,
            (s - sq1) / 2.0,
            (-s + sq2) / 2.0,
            (-s - sq2) / 2.0,
        ],
        axis=-1,
    ) - (b / 4.0)[..., None]

    valid = jnp.stack([disc1 >= 0, disc1 >= 0, disc2 >= 0, disc2 >= 0], axis=-1)

    # Newton polish on the original quartic (restores f32 precision)
    def poly(x):
        return (((c4[..., None] * x + c3[..., None]) * x + c2[..., None]) * x + c1[..., None]) * x + c0[..., None]

    def dpoly(x):
        return ((4.0 * c4[..., None] * x + 3.0 * c3[..., None]) * x + 2.0 * c2[..., None]) * x + c1[..., None]

    for _ in range(3):
        f = poly(roots)
        df = dpoly(roots)
        step = f / jnp.where(jnp.abs(df) < _EPS, jnp.inf, df)
        roots = roots - jnp.where(valid, step, 0.0)

    return roots, valid


def _triangle_frame(pts: jax.Array) -> jax.Array:
    """Right-handed orthonormal frame of a 3-point triangle (..., 3, 3).

    Columns: normalized first edge, in-plane perpendicular, normal.
    """
    e1 = pts[..., 1, :] - pts[..., 0, :]
    e2 = pts[..., 2, :] - pts[..., 0, :]
    u = e1 / jnp.maximum(jnp.linalg.norm(e1, axis=-1, keepdims=True), _EPS)
    n = jnp.cross(e1, e2)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), _EPS)
    v = jnp.cross(n, u)
    return jnp.stack([u, v, n], axis=-1)


@f32_matmul
def _kabsch_3pt(cam_pts: jax.Array, world_pts: jax.Array):
    """Rigid w2c transform from 3 exact correspondences (no scale).

    cam_pts, world_pts: (..., 3, 3) rows are points. Returns (R, t) with
    cam = R @ world + t.

    P3P minimal sets are congruent by construction (distances preserved up
    to quartic-root noise), so the rotation comes from aligning the two
    triangle frames directly: R = F_cam @ F_world^T — closed-form arithmetic
    instead of tens of thousands of tiny SVDs, whose iterative XLA lowering
    dominates registration latency on TPU. Degenerate (collinear) triangles
    produce garbage frames that the downstream 4-point validation rejects.
    """
    F_c = _triangle_frame(cam_pts)
    F_w = _triangle_frame(world_pts)
    R = F_c @ jnp.swapaxes(F_w, -1, -2)
    mu_c = jnp.mean(cam_pts, axis=-2)
    mu_w = jnp.mean(world_pts, axis=-2)
    t = mu_c - (R @ mu_w[..., :, None])[..., 0]
    return R, t


@f32_matmul
def p3p_grunert(world_pts: jax.Array, bearings: jax.Array):
    """Candidate camera poses from 3 world points and 3 camera bearings.

    Args:
      world_pts: (..., 3, 3) world points (rows).
      bearings: (..., 3, 3) unit view rays in the camera frame (rows).

    Returns:
      (R, t, valid): (..., 4, 3, 3), (..., 4, 3), (..., 4) — up to four
      world-to-camera candidates (cam = R @ world + t) with validity masks.
    """
    P1, P2, P3 = world_pts[..., 0, :], world_pts[..., 1, :], world_pts[..., 2, :]
    f1, f2, f3 = bearings[..., 0, :], bearings[..., 1, :], bearings[..., 2, :]

    a2 = jnp.sum((P2 - P3) ** 2, axis=-1)
    b2 = jnp.sum((P1 - P3) ** 2, axis=-1)
    c2 = jnp.sum((P1 - P2) ** 2, axis=-1)
    b2 = jnp.maximum(b2, _EPS)

    cos_a = jnp.sum(f2 * f3, axis=-1)
    cos_b = jnp.sum(f1 * f3, axis=-1)
    cos_g = jnp.sum(f1 * f2, axis=-1)

    p = (a2 - c2) / b2
    cb2 = c2 / b2

    # N(v) = p (1 + v^2 - 2 v cos_b) + 1 - v^2         (coeffs in v)
    n2 = p - 1.0
    n1 = -2.0 * p * cos_b
    n0 = p + 1.0
    # D(v) = 2 (cos_g - v cos_a)
    d1 = -2.0 * cos_a
    d0 = 2.0 * cos_g
    # E(v) = 1 - (c2/b2)(1 + v^2 - 2 v cos_b)
    e2 = -cb2
    e1 = 2.0 * cb2 * cos_b
    e0 = 1.0 - cb2

    # Quartic: N^2 - 2 cos_g N D + D^2 E = 0, expanded by static convolution.
    # N^2 terms
    q4 = n2 * n2
    q3 = 2.0 * n2 * n1
    q2 = 2.0 * n2 * n0 + n1 * n1
    q1 = 2.0 * n1 * n0
    q0 = n0 * n0
    # -2 cos_g * N * D terms (N deg2 * D deg1 -> deg3)
    g = -2.0 * cos_g
    q3 = q3 + g * n2 * d1
    q2 = q2 + g * (n2 * d0 + n1 * d1)
    q1 = q1 + g * (n1 * d0 + n0 * d1)
    q0 = q0 + g * n0 * d0
    # D^2 * E terms (deg2 * deg2 -> deg4)
    dd2 = d1 * d1
    dd1 = 2.0 * d1 * d0
    dd0 = d0 * d0
    q4 = q4 + dd2 * e2
    q3 = q3 + dd2 * e1 + dd1 * e2
    q2 = q2 + dd2 * e0 + dd1 * e1 + dd0 * e2
    q1 = q1 + dd1 * e0 + dd0 * e1
    q0 = q0 + dd0 * e0

    coeffs = jnp.stack([q4, q3, q2, q1, q0], axis=-1)
    v_roots, v_valid = solve_quartic(coeffs)  # (..., 4)

    # u from the linear relation (III): u = N(v) / D(v)
    Nv = (n2[..., None] * v_roots + n1[..., None]) * v_roots + n0[..., None]
    Dv = d1[..., None] * v_roots + d0[..., None]
    u = Nv / jnp.where(jnp.abs(Dv) < 1e-8, jnp.inf, Dv)

    denom = 1.0 + v_roots * v_roots - 2.0 * v_roots * cos_b[..., None]
    s1 = jnp.sqrt(b2[..., None] / jnp.maximum(denom, _EPS))
    s2 = u * s1
    s3 = v_roots * s1

    valid = (
        v_valid
        & (v_roots > 0)
        & (u > 0)
        & (denom > _EPS)
        & jnp.isfinite(s1)
        & jnp.isfinite(s2)
    )

    # Newton polish of the distances on the ORIGINAL law-of-cosines system.
    # The Grunert quartic amplifies f32 rounding error by orders of magnitude
    # for small-angle / near-collinear configurations (observed: roots exact
    # in f64 but 20+ deg of pose error in f32); three Newton steps on
    #   g1 = s2^2 + s3^2 - 2 s2 s3 cos_a - a2
    #   g2 = s1^2 + s3^2 - 2 s1 s3 cos_b - b2
    #   g3 = s1^2 + s2^2 - 2 s1 s2 cos_g - c2
    # converge quadratically back to near-machine accuracy.
    a2e = a2[..., None]
    c2e = c2[..., None]
    b2e = b2[..., None]
    ca, cb, cg = cos_a[..., None], cos_b[..., None], cos_g[..., None]
    zero = jnp.zeros_like(s1)
    for _ in range(3):
        g1 = s2 * s2 + s3 * s3 - 2.0 * s2 * s3 * ca - a2e
        g2 = s1 * s1 + s3 * s3 - 2.0 * s1 * s3 * cb - b2e
        g3 = s1 * s1 + s2 * s2 - 2.0 * s1 * s2 * cg - c2e
        gvec = jnp.stack([g1, g2, g3], axis=-1)[..., None]  # (..., 4, 3, 1)
        J = jnp.stack(
            [
                jnp.stack([zero, 2.0 * (s2 - s3 * ca), 2.0 * (s3 - s2 * ca)], axis=-1),
                jnp.stack([2.0 * (s1 - s3 * cb), zero, 2.0 * (s3 - s1 * cb)], axis=-1),
                jnp.stack([2.0 * (s1 - s2 * cg), 2.0 * (s2 - s1 * cg), zero], axis=-1),
            ],
            axis=-2,
        )  # (..., 4, 3, 3)
        # guard singular Jacobians (degenerate triangles) with damping
        Jd = J + 1e-6 * jnp.eye(3, dtype=J.dtype)
        step = jnp.linalg.solve(Jd, gvec)[..., 0]
        step = jnp.where(jnp.isfinite(step), step, 0.0)
        s1 = s1 - step[..., 0]
        s2 = s2 - step[..., 1]
        s3 = s3 - step[..., 2]
    valid = valid & (s1 > 0) & (s2 > 0) & (s3 > 0)

    # camera-frame points per candidate: (..., 4, 3, 3)
    cam_pts = jnp.stack(
        [
            s1[..., None] * f1[..., None, :],
            s2[..., None] * f2[..., None, :],
            s3[..., None] * f3[..., None, :],
        ],
        axis=-2,
    )
    world_rep = jnp.broadcast_to(
        world_pts[..., None, :, :], cam_pts.shape
    )
    R, t = _kabsch_3pt(cam_pts, world_rep)
    valid = valid & jnp.isfinite(t).all(axis=-1)
    return R, t, valid
