import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from acezero_tpu.geometry import (
    backproject_depth,
    get_pixel_grid,
    invert_se3,
    kabsch_umeyama,
    make_intrinsics,
    make_se3,
    project_points,
    to_homogeneous,
)


def _random_pose(rng):
    T = np.eye(4)
    T[:3, :3] = Rotation.random(random_state=np.random.RandomState(3)).as_matrix()
    T[:3, 3] = rng.normal(size=3)
    return T


def test_invert_se3(rng):
    T = jnp.asarray(_random_pose(rng), jnp.float32)
    I = np.asarray(invert_se3(T) @ T)
    np.testing.assert_allclose(I, np.eye(4), atol=1e-5)


def test_to_homogeneous():
    x = jnp.ones((5, 3))
    h = to_homogeneous(x)
    assert h.shape == (5, 4)
    np.testing.assert_allclose(np.asarray(h[:, 3]), 1.0)


def test_pixel_grid_matches_reference_semantics():
    # reference: subsampling * (idx + 0.5)  == idx*8 + 4 for subsample 8
    g = np.asarray(get_pixel_grid(4, 6))
    assert g.shape == (4, 6, 2)
    assert g[0, 0, 0] == 4.0 and g[0, 0, 1] == 4.0
    assert g[2, 3, 0] == 3 * 8 + 4 and g[2, 3, 1] == 2 * 8 + 4


def test_project_backproject_consistency(rng):
    # Random scene: backproject depth, then reproject with the inverse pose.
    h, w = 12, 16
    focal, cx, cy = 500.0, 64.0, 48.0
    depth = jnp.asarray(rng.uniform(1.0, 5.0, size=(h, w)), jnp.float32)
    pose_c2w = jnp.asarray(_random_pose(rng), jnp.float32)
    grid = get_pixel_grid(h, w)

    pts_w = backproject_depth(depth, focal, cx, cy, pose_c2w, grid)
    K = make_intrinsics(focal, cx, cy)
    px, z = project_points(pts_w.reshape(-1, 3), invert_se3(pose_c2w), K)

    np.testing.assert_allclose(
        np.asarray(px).reshape(h, w, 2), np.asarray(grid), atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(z).reshape(h, w), np.asarray(depth), atol=1e-3
    )


def test_backproject_invalid_depth_zeroed():
    grid = get_pixel_grid(2, 2)
    depth = jnp.asarray([[0.0, 2.0], [1001.0, 3.0]], jnp.float32)
    pts = np.asarray(
        backproject_depth(depth, 100.0, 8.0, 8.0, jnp.eye(4), grid)
    )
    assert np.all(pts[0, 0] == 0)
    assert np.all(pts[1, 0] == 0)
    assert np.any(pts[0, 1] != 0)


def test_kabsch_exact_alignment(rng):
    pts1 = rng.normal(size=(50, 3))
    T_true = _random_pose(rng)
    scale_true = 1.7
    pts2 = scale_true * pts1 @ T_true[:3, :3].T + T_true[:3, 3]

    T, scale = kabsch_umeyama(
        jnp.asarray(pts1, jnp.float32), jnp.asarray(pts2, jnp.float32), estimate_scale=True
    )
    np.testing.assert_allclose(float(scale), scale_true, rtol=1e-4)
    aligned = pts1 @ np.asarray(T)[:3, :3].T + np.asarray(T)[:3, 3]
    np.testing.assert_allclose(aligned, pts2, atol=1e-3)


def test_kabsch_matches_reference_formula(rng):
    # cross-check against a direct numpy transcription of the reference math
    def ref_kabsch(pts1, pts2, estimate_scale):
        c1 = pts1 - pts1.mean(axis=0)
        c2 = pts2 - pts2.mean(axis=0)
        cov = c1.T @ c2 / c1.shape[0]
        U, S, VT = np.linalg.svd(cov)
        d = np.sign(np.linalg.det(VT.T @ U.T))
        corr = np.eye(3)
        corr[2, 2] = d
        if estimate_scale:
            pts_var = np.mean(np.linalg.norm(c2, axis=1) ** 2)
            scale = pts_var / np.trace(S * corr)
        else:
            scale = 1.0
        R = scale * (VT.T @ corr @ U.T)
        t = pts2.mean(axis=0) - R @ pts1.mean(axis=0)
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        return T, scale

    pts1 = rng.normal(size=(30, 3))
    pts2 = rng.normal(size=(30, 3)) + 0.8 * pts1
    for estimate_scale in (False, True):
        T_ref, s_ref = ref_kabsch(pts1, pts2, estimate_scale)
        T_ours, s_ours = kabsch_umeyama(
            jnp.asarray(pts1, jnp.float32),
            jnp.asarray(pts2, jnp.float32),
            estimate_scale=estimate_scale,
        )
        np.testing.assert_allclose(np.asarray(T_ours), T_ref, atol=1e-4)
        np.testing.assert_allclose(float(s_ours), s_ref, rtol=1e-4)


def test_kabsch_weighted_subset(rng):
    pts1 = rng.normal(size=(40, 3))
    T_true = _random_pose(rng)
    pts2 = pts1 @ T_true[:3, :3].T + T_true[:3, 3]
    # corrupt half the points; mask them out with weights
    pts2_noisy = pts2.copy()
    pts2_noisy[20:] += rng.normal(size=(20, 3)) * 5
    w = np.concatenate([np.ones(20), np.zeros(20)])
    T, _ = kabsch_umeyama(
        jnp.asarray(pts1, jnp.float32),
        jnp.asarray(pts2_noisy, jnp.float32),
        weights=jnp.asarray(w, jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(T), T_true, atol=1e-3)
