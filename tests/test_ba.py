"""Golden tests for the pose-only matched-pair bundle adjustment
(reconstruct/ba.py): exact synthetic correspondences, smooth ring-drift
perturbations (the production failure mode), outlier contamination."""

import numpy as np
import jax.numpy as jnp
import pytest

from acezero_tpu.geometry.kabsch import kabsch_umeyama
from acezero_tpu.reconstruct.ba import pose_ba_core, tracks_from_pair_matches


def _ring_setup(rng, n=12, n_pts=400, focal=520.0, w=640, h=480):
    """Cameras on an IRREGULAR ring (varying radius/height/aim), points in
    the room. A perfect orbital ring is a (near-)critical configuration:
    measured in f64, a smooth non-similarity bend of the camera set fits
    exact track observations to < 5e-4 px — i.e. the bend mode carries
    essentially no pixel signal at narrow FOV. Handheld captures are
    irregular, which is what makes the bend observable at all; the test
    geometry reflects that."""
    ppx, ppy = w / 2.0, h / 2.0
    pts = np.stack(
        [
            rng.uniform(-2.5, 2.5, n_pts),
            rng.uniform(-1.5, 1.5, n_pts),
            rng.uniform(-2.5, 2.5, n_pts),
        ],
        1,
    )
    Rs, ts = [], []
    for k in range(n):
        ang = 2 * np.pi * k / n + rng.uniform(-0.15, 0.15)
        rad = rng.uniform(2.8, 3.6)
        c = np.array([rad * np.cos(ang), rng.uniform(-0.5, 0.5), rad * np.sin(ang)])
        look = np.array(
            [rng.uniform(-0.5, 0.5), rng.uniform(-0.3, 0.3), rng.uniform(-0.5, 0.5)]
        )
        fwd = look - c
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        upv = np.cross(fwd, right)
        R = np.stack([right, upv, fwd])  # rows: cam axes -> world-to-cam
        Rs.append(R)
        ts.append(-R @ c)
    return np.stack(Rs), np.stack(ts), pts, focal, ppx, ppy


def _project(R, t, pts, focal, ppx, ppy):
    pc = pts @ R.T + t
    z = pc[:, 2]
    u = np.stack([focal * pc[:, 0] / z + ppx, focal * pc[:, 1] / z + ppy], 1)
    vis = (z > 0.3) & (u[:, 0] > 5) & (u[:, 0] < 2 * ppx - 5) & (u[:, 1] > 5) & (u[:, 1] < 2 * ppy - 5)
    return u, vis


def _make_matches(Rs, ts, pts, focal, ppx, ppy, max_sep=2):
    n = len(Rs)
    pair_idx, us, ut, oks = [], [], [], []
    for i in range(n):
        for d in range(1, max_sep + 1):
            j = (i + d) % n
            ua, va = _project(Rs[i], ts[i], pts, focal, ppx, ppy)
            ub, vb = _project(Rs[j], ts[j], pts, focal, ppx, ppy)
            ok = va & vb
            pair_idx.append((i, j))
            us.append(ua)
            ut.append(ub)
            oks.append(ok)
    return (
        np.asarray(pair_idx, np.int32),
        np.stack(us).astype(np.float32),
        np.stack(ut).astype(np.float32),
        np.stack(oks),
    )


def _smooth_drift(n, rng, rot_deg=1.5, trans=0.08):
    """Low-frequency (bend-mode) pose perturbations; frame 0 exact."""
    ph = rng.uniform(0, 2 * np.pi, 3)
    ks = np.arange(n) / n
    w = np.stack(
        [np.sin(2 * np.pi * ks + ph[0]), np.sin(4 * np.pi * ks + ph[1]),
         np.cos(2 * np.pi * ks + ph[2])], 1
    )
    w = np.radians(rot_deg) * w
    v = trans * np.stack(
        [np.cos(2 * np.pi * ks + ph[1]), np.sin(4 * np.pi * ks + ph[2]),
         np.sin(2 * np.pi * ks + ph[0])], 1
    )
    w[0] = 0.0
    v[0] = 0.0
    return w, v


def _apply_drift(Rs, ts, w, v):
    from scipy.spatial.transform import Rotation

    Rd = np.stack([Rotation.from_rotvec(wk).as_matrix() @ Rk for wk, Rk in zip(w, Rs)])
    return Rd, ts + v


def _pose_errors_after_sim3(R_est, t_est, R_gt, t_gt):
    """Per-frame errors after similarity-aligning camera centers to GT."""
    c_est = np.einsum("nij,ni->nj", R_est.transpose(0, 2, 1), -t_est)
    c_gt = np.einsum("nij,ni->nj", R_gt.transpose(0, 2, 1), -t_gt)
    T, s = kabsch_umeyama(
        jnp.asarray(c_est, jnp.float32), jnp.asarray(c_gt, jnp.float32),
        estimate_scale=True,
    )
    T = np.asarray(T, np.float64)
    sR, tk = T[:3, :3], T[:3, 3]  # scale folded into sR
    Rk = sR / float(np.asarray(s))
    c_al = c_est @ sR.T + tk
    t_err = np.linalg.norm(c_al - c_gt, axis=1)
    r_err = []
    for k in range(len(R_est)):
        rel = (R_est[k] @ Rk.T) @ R_gt[k].T
        r_err.append(np.degrees(np.arccos(np.clip((np.trace(rel) - 1) / 2, -1, 1))))
    return t_err, np.asarray(r_err)




def _as_tracks(pair_idx, us, ut, ok):
    trk_f, trk_px, trk_ok = tracks_from_pair_matches(pair_idx, us, ut, ok)
    return (
        jnp.asarray(trk_f, jnp.int32),
        jnp.asarray(trk_px, jnp.float32),
        jnp.asarray(trk_ok),
    )

def test_ba_recovers_smooth_ring_drift(rng):
    Rs, ts, pts, focal, ppx, ppy = _ring_setup(rng)
    # production pair selection is overlap-gated and spans wide ring
    # separations on convergent captures; pairwise-only constraints at +-2
    # neighbors leave a soft bend mode (~3 cm for 8 cm drift), +-3 pins it
    pair_idx, us, ut, ok = _make_matches(Rs, ts, pts, focal, ppx, ppy, max_sep=3)
    w, v = _smooth_drift(len(Rs), rng)
    R0, t0 = _apply_drift(Rs, ts, w, v)

    t_err0, r_err0 = _pose_errors_after_sim3(R0, t0, Rs, ts)
    assert np.median(t_err0) > 0.03  # the drift is material

    n = len(Rs)
    R, t, diag = pose_ba_core(
        jnp.asarray(R0, jnp.float32), jnp.asarray(t0, jnp.float32),
        jnp.full((n,), focal, jnp.float32), ppx, ppy,
        *_as_tracks(pair_idx, us, ut, ok),
        iterations=30,
        # exact noise-free matches: the production-strength soft-mode prior
        # is not needed and would mask the solver-recovery property under test
        prior_rot=1e2, prior_t=1e2,
    )
    t_err, r_err = _pose_errors_after_sim3(np.asarray(R), np.asarray(t), Rs, ts)
    # residual sits in the weakly-observable bend mode (see _ring_setup
    # docstring); the observable component must be drained
    assert np.median(t_err) < 0.04, f"median center error {np.median(t_err)}"
    assert np.median(t_err) < 0.5 * np.median(t_err0)
    assert np.median(r_err) < 0.1, f"median rotation error {r_err}"
    rms = np.asarray(diag["rms_px"])
    assert rms[-1] < 0.5  # exact matches -> subpixel convergence


def test_ba_robust_to_outlier_matches(rng):
    Rs, ts, pts, focal, ppx, ppy = _ring_setup(rng)
    pair_idx, us, ut, ok = _make_matches(Rs, ts, pts, focal, ppx, ppy)
    # corrupt 20% of target pixels
    m = rng.uniform(size=ut.shape[:2]) < 0.2
    ut = ut + m[..., None] * rng.normal(size=ut.shape).astype(np.float32) * 80.0
    w, v = _smooth_drift(len(Rs), rng)
    R0, t0 = _apply_drift(Rs, ts, w, v)
    n = len(Rs)
    R, t, _ = pose_ba_core(
        jnp.asarray(R0, jnp.float32), jnp.asarray(t0, jnp.float32),
        jnp.full((n,), focal, jnp.float32), ppx, ppy,
        *_as_tracks(pair_idx, us, ut, ok),
        iterations=30,
        prior_rot=1e2, prior_t=1e2,
    )
    t_err, r_err = _pose_errors_after_sim3(np.asarray(R), np.asarray(t), Rs, ts)
    assert np.median(t_err) < 0.035, f"median center error {np.median(t_err)}"
    assert np.median(r_err) < 0.15


def test_ba_noop_on_exact_poses(rng):
    """Already-correct poses must stay put (no self-induced distortion)."""
    Rs, ts, pts, focal, ppx, ppy = _ring_setup(rng)
    pair_idx, us, ut, ok = _make_matches(Rs, ts, pts, focal, ppx, ppy)
    n = len(Rs)
    R, t, diag = pose_ba_core(
        jnp.asarray(Rs, jnp.float32), jnp.asarray(ts, jnp.float32),
        jnp.full((n,), focal, jnp.float32), ppx, ppy,
        *_as_tracks(pair_idx, us, ut, ok),
        iterations=10,
    )
    c0 = np.einsum("nij,ni->nj", Rs.transpose(0, 2, 1), -ts)
    c1 = np.einsum("nij,ni->nj", np.asarray(R).transpose(0, 2, 1), -np.asarray(t))
    assert np.max(np.linalg.norm(c1 - c0, axis=1)) < 1e-3
