"""Golden-value registrar parity vs OpenCV (SURVEY.md §7 top validation risk).

The reference solves every pose with cv2 inside the DSAC* C++ extension:
P3P minimal solves (/root/reference/dsacstar/dsacstar_util.h:91-120, flag
SOLVEPNP_P3P) and ITERATIVE refits with an extrinsic guess (refineHyp,
dsacstar_util.h:522-597). These tests pin our JAX solvers to cv2 on
identical correspondences, including noisy and outlier regimes.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acezero_tpu.geometry.projection import get_pixel_grid
from acezero_tpu.registration import (
    RansacConfig,
    estimate_pose,
    lm_pnp,
    p3p_grunert,
)
from acezero_tpu.geometry.rotations import rodrigues_to_matrix


def _random_pose(rng):
    rvec = rng.normal(size=3) * 0.4
    R, _ = cv2.Rodrigues(rvec)
    t = rng.normal(size=3) * 0.5 + np.array([0.0, 0.0, 0.5])
    return rvec.astype(np.float64), R, t


def _make_scene(rng, n, f=525.0, ppx=320.0, ppy=240.0, noise=0.0):
    """World points + exact pixel projections under a random w2c pose."""
    rvec, R, t = _random_pose(rng)
    # points in front of the camera: sample in cam frame, lift to world
    p_cam = np.stack(
        [
            rng.uniform(-2.0, 2.0, n),
            rng.uniform(-1.5, 1.5, n),
            rng.uniform(2.0, 8.0, n),
        ],
        axis=-1,
    )
    p_world = (p_cam - t) @ R  # R^T (p_cam - t)
    px = np.stack(
        [
            f * p_cam[:, 0] / p_cam[:, 2] + ppx,
            f * p_cam[:, 1] / p_cam[:, 2] + ppy,
        ],
        axis=-1,
    )
    if noise > 0:
        px = px + rng.normal(size=px.shape) * noise
    K = np.array([[f, 0, ppx], [0, f, ppy], [0, 0, 1.0]])
    return rvec, R, t, p_world, px, K


def _rot_err_deg(R1, R2):
    cosv = (np.trace(R1.T @ R2) - 1.0) / 2.0
    return np.degrees(np.arccos(np.clip(cosv, -1.0, 1.0)))


def _bearings(px, f, ppx, ppy):
    b = np.stack(
        [(px[:, 0] - ppx) / f, (px[:, 1] - ppy) / f, np.ones(len(px))], axis=-1
    )
    return b / np.linalg.norm(b, axis=-1, keepdims=True)


@pytest.mark.slow
class TestP3PGolden:
    def test_candidates_cover_cv2_solutions(self):
        """Every cv2.solveP3P solution must appear among our candidates."""
        rng = np.random.default_rng(7)
        f, ppx, ppy = 525.0, 320.0, 240.0
        covered = 0
        total = 0
        for trial in range(20):
            rvec, R, t, pts, px, K = _make_scene(rng, 3, f, ppx, ppy)
            n, rvecs, tvecs = cv2.solveP3P(
                pts.reshape(-1, 1, 3),
                px.reshape(-1, 1, 2),
                K,
                None,
                flags=cv2.SOLVEPNP_P3P,
            )
            bear = _bearings(px, f, ppx, ppy)
            Rc, tc, valid = p3p_grunert(
                jnp.asarray(pts, jnp.float32)[None],
                jnp.asarray(bear, jnp.float32)[None],
            )
            Rc = np.asarray(Rc[0])  # (4, 3, 3)
            tc = np.asarray(tc[0])  # (4, 3)
            valid = np.asarray(valid[0])
            for i in range(int(n)):
                Rcv, _ = cv2.Rodrigues(rvecs[i])
                tcv = tvecs[i].ravel()
                total += 1
                for c in range(4):
                    if not valid[c]:
                        continue
                    if (
                        _rot_err_deg(Rc[c], Rcv) < 0.5
                        and np.linalg.norm(tc[c] - tcv) < 0.02
                    ):
                        covered += 1
                        break
        # f32 quartic vs cv2's f64: the true-pose root is always found; the
        # spurious extra roots occasionally differ — require full coverage of
        # at least 90% of cv2 solutions and that every scene's TRUE pose is
        # covered (checked implicitly by the sampler test below)
        assert covered / total > 0.9, f"covered {covered}/{total}"

    def test_true_pose_always_recovered(self):
        rng = np.random.default_rng(11)
        f, ppx, ppy = 525.0, 320.0, 240.0
        loose = 0
        for trial in range(40):
            rvec, R, t, pts, px, K = _make_scene(rng, 3, f, ppx, ppy)
            bear = _bearings(px, f, ppx, ppy)
            Rc, tc, valid = p3p_grunert(
                jnp.asarray(pts, jnp.float32)[None],
                jnp.asarray(bear, jnp.float32)[None],
            )
            Rc, tc, valid = np.asarray(Rc[0]), np.asarray(tc[0]), np.asarray(valid[0])
            errs = [
                (c, _rot_err_deg(Rc[c], R) + np.linalg.norm(tc[c] - t))
                for c in range(4)
                if valid[c]
            ]
            # f32 quartic roots can drift ~1deg in near-degenerate triangles,
            # but stay firmly inside the true root's basin (wrong candidates
            # sit tens of degrees away); the production sampler's LM polish
            # then recovers the exact pose
            assert errs and min(e for _, e in errs) < 5.0, f"trial {trial}: {errs}"
            # polish every valid candidate: 3-point P3P can have twin exact
            # solutions (the sampler disambiguates with a 4th point); at
            # least one polished candidate must land on the true pose
            polished = []
            for c, _ in errs:
                r_p, t_p, _ = lm_pnp(
                    jnp.asarray(cv2.Rodrigues(Rc[c])[0].ravel(), jnp.float32),
                    jnp.asarray(tc[c], jnp.float32),
                    jnp.asarray(pts, jnp.float32),
                    jnp.asarray(px, jnp.float32),
                    jnp.ones(3, jnp.float32),
                    jnp.asarray(f),
                    jnp.asarray(ppx),
                    jnp.asarray(ppy),
                    iterations=6,
                )
                R_p = np.asarray(rodrigues_to_matrix(r_p))
                polished.append(
                    _rot_err_deg(R_p, R) + np.linalg.norm(np.asarray(t_p) - t)
                )
            # ill-conditioned (near-collinear) triangles admit exact
            # interpolating poses ~0.1 from GT in f32 — count but tolerate a
            # couple; the production 4th-point + dense-inlier refits recover
            # those frames (full-registrar test below)
            assert min(polished) < 0.25, f"trial {trial}: polished {polished}"
            if min(polished) >= 0.05:
                loose += 1
        assert loose <= 2, f"{loose}/40 trials above the tight 0.05 bound"


class TestLMGolden:
    def test_matches_cv2_iterative_noisefree(self):
        """Identical minimum on exact correspondences from a perturbed init."""
        rng = np.random.default_rng(3)
        f, ppx, ppy = 525.0, 320.0, 240.0
        for trial in range(10):
            rvec, R, t, pts, px, K = _make_scene(rng, 50, f, ppx, ppy)
            r0 = rvec + rng.normal(size=3) * 0.05
            t0 = t + rng.normal(size=3) * 0.1
            ok, rcv, tcv = cv2.solvePnP(
                pts.reshape(-1, 1, 3),
                px.reshape(-1, 1, 2),
                K,
                None,
                rvec=r0.reshape(3, 1).copy(),
                tvec=t0.reshape(3, 1).copy(),
                useExtrinsicGuess=True,
                flags=cv2.SOLVEPNP_ITERATIVE,
            )
            assert ok
            r_j, t_j, cost = lm_pnp(
                jnp.asarray(r0, jnp.float32),
                jnp.asarray(t0, jnp.float32),
                jnp.asarray(pts, jnp.float32),
                jnp.asarray(px, jnp.float32),
                jnp.ones(len(pts), jnp.float32),
                jnp.asarray(f),
                jnp.asarray(ppx),
                jnp.asarray(ppy),
                iterations=10,
            )
            R_j = np.asarray(rodrigues_to_matrix(r_j))
            Rcv, _ = cv2.Rodrigues(rcv)
            assert _rot_err_deg(R_j, Rcv) < 0.05
            assert np.linalg.norm(np.asarray(t_j) - tcv.ravel()) < 5e-3
            assert float(cost) < 1e-4

    def test_matches_cv2_iterative_noisy(self):
        """Same least-squares optimum under 1px gaussian pixel noise."""
        rng = np.random.default_rng(5)
        f, ppx, ppy = 525.0, 320.0, 240.0
        for trial in range(10):
            rvec, R, t, pts, px, K = _make_scene(rng, 200, f, ppx, ppy, noise=1.0)
            r0 = rvec + rng.normal(size=3) * 0.03
            t0 = t + rng.normal(size=3) * 0.05
            ok, rcv, tcv = cv2.solvePnP(
                pts.reshape(-1, 1, 3),
                px.reshape(-1, 1, 2),
                K,
                None,
                rvec=r0.reshape(3, 1).copy(),
                tvec=t0.reshape(3, 1).copy(),
                useExtrinsicGuess=True,
                flags=cv2.SOLVEPNP_ITERATIVE,
            )
            assert ok
            r_j, t_j, _ = lm_pnp(
                jnp.asarray(r0, jnp.float32),
                jnp.asarray(t0, jnp.float32),
                jnp.asarray(pts, jnp.float32),
                jnp.asarray(px, jnp.float32),
                jnp.ones(len(pts), jnp.float32),
                jnp.asarray(f),
                jnp.asarray(ppx),
                jnp.asarray(ppy),
                iterations=12,
            )
            R_j = np.asarray(rodrigues_to_matrix(r_j))
            Rcv, _ = cv2.Rodrigues(rcv)
            assert _rot_err_deg(R_j, Rcv) < 0.1
            assert np.linalg.norm(np.asarray(t_j) - tcv.ravel()) < 0.01


@pytest.mark.slow
class TestFullRegistrarGolden:
    """estimate_pose vs cv2.solvePnPRansac on a dense noisy+outlier frame."""

    @pytest.mark.parametrize("outlier_frac", [0.0, 0.3])
    def test_pose_parity_with_outliers(self, outlier_frac):
        rng = np.random.default_rng(17)
        f, ppx, ppy = 525.0, 320.0, 240.0
        h, w = 30, 40
        grid = np.asarray(get_pixel_grid(h, w))  # (h, w, 2), full-res px
        # scene coords: backproject the grid under a GT pose with noise
        rvec, R, t = _random_pose(rng)
        depth = rng.uniform(2.0, 6.0, (h, w))
        x = (grid[..., 0] - ppx) / f * depth
        y = (grid[..., 1] - ppy) / f * depth
        p_cam = np.stack([x, y, depth], axis=-1)
        p_world = (p_cam.reshape(-1, 3) - t) @ R
        p_world += rng.normal(size=p_world.shape) * 0.005  # ~1px noise
        n_out = int(outlier_frac * len(p_world))
        out_idx = rng.choice(len(p_world), n_out, replace=False)
        p_world[out_idx] += rng.normal(size=(n_out, 3)) * 2.0

        out = estimate_pose(
            jax.random.PRNGKey(0),
            jnp.asarray(p_world.reshape(h, w, 3), jnp.float32),
            jnp.ones((h, w), bool),
            jnp.asarray(grid, jnp.float32),
            jnp.asarray(f),
            jnp.asarray(ppx),
            jnp.asarray(ppy),
            RansacConfig(hypotheses=64, max_tries=16),
        )
        pose_c2w = np.asarray(out["pose_c2w"])
        R_j = pose_c2w[:3, :3].T  # w2c rotation
        t_j = -R_j @ pose_c2w[:3, 3]

        ok, rcv, tcv, inl = cv2.solvePnPRansac(
            p_world.reshape(-1, 1, 3),
            grid.reshape(-1, 1, 2),
            np.array([[f, 0, ppx], [0, f, ppy], [0, 0, 1.0]]),
            None,
            iterationsCount=64,
            reprojectionError=10.0,
            flags=cv2.SOLVEPNP_P3P,
        )
        assert ok
        Rcv, _ = cv2.Rodrigues(rcv)

        # both must be close to GT (and hence each other)
        assert _rot_err_deg(R_j, R) < 0.5, _rot_err_deg(R_j, R)
        assert np.linalg.norm(t_j - t) < 0.05
        assert _rot_err_deg(Rcv, R) < 0.5
        # inlier counts comparable: ours counts valid cells under 10px
        frac_inl = float(out["inlier_count"]) / (h * w)
        assert frac_inl > 0.9 * (1.0 - outlier_frac)

    def test_sampling_failure_rate_low_texture(self):
        """Measure the 64x16-draw total-failure rate on a hard frame: few
        valid cells, strong noise. Documents VERDICT weak #2; the driver adds
        a retry fallback (tested in test_registration.py)."""
        rng = np.random.default_rng(23)
        f, ppx, ppy = 525.0, 320.0, 240.0
        h, w = 30, 40
        grid = np.asarray(get_pixel_grid(h, w))
        rvec, R, t = _random_pose(rng)
        depth = rng.uniform(2.0, 6.0, (h, w))
        x = (grid[..., 0] - ppx) / f * depth
        y = (grid[..., 1] - ppy) / f * depth
        p_cam = np.stack([x, y, depth], axis=-1)
        p_world = ((p_cam.reshape(-1, 3) - t) @ R).reshape(h, w, 3)
        # only 3% of cells valid and heavy noise on half of those
        mask = rng.random((h, w)) < 0.03
        noisy = rng.random((h, w)) < 0.5
        p_world = p_world + noisy[..., None] * rng.normal(size=(h, w, 3)) * 0.5

        failures = 0
        for trial in range(8):
            out = estimate_pose(
                jax.random.PRNGKey(trial),
                jnp.asarray(p_world, jnp.float32),
                jnp.asarray(mask),
                jnp.asarray(grid, jnp.float32),
                jnp.asarray(f),
                jnp.asarray(ppx),
                jnp.asarray(ppy),
                RansacConfig(hypotheses=64, max_tries=16),
            )
            if not bool(out["valid"]):
                failures += 1
        # with ~36 valid cells and 50% heavy outliers, 1024 draws must still
        # find clean minimal sets in the vast majority of trials
        assert failures <= 1, f"{failures}/8 total sampling failures"
