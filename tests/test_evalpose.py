import numpy as np
from scipy.spatial.transform import Rotation

from acezero_tpu.evalpose import estimate_alignment, evaluate_poses
from acezero_tpu.io.pose_files import PoseFileEntry


def _random_c2w(rs, t_scale=2.0):
    T = np.eye(4)
    T[:3, :3] = Rotation.random(random_state=rs).as_matrix()
    T[:3, 3] = np.random.RandomState(rs).normal(size=3) * t_scale
    return T


def _make_pose_sets(rng, n=40, scale=1.6, outliers=5):
    """GT poses + estimates = similarity(GT) with a few corrupted ones."""
    gt = np.stack([_random_c2w(i) for i in range(n)])
    T_align = np.eye(4)
    T_align[:3, :3] = scale * Rotation.random(random_state=99).as_matrix()
    T_align[:3, 3] = [0.5, -1.0, 2.0]

    est = np.einsum("ab,nbc->nac", T_align, gt)
    est[:, :3, :3] /= scale  # rotations stay orthonormal; translations scale

    conf = np.full(n, 2000.0)
    idx = rng.choice(n, outliers, replace=False)
    est[idx, :3, 3] += rng.normal(size=(outliers, 3)) * 3.0
    return gt, est, conf, T_align


def test_alignment_recovers_similarity(rng):
    gt, est, conf, T_true = _make_pose_sets(rng)
    T, scale = estimate_alignment(est, gt, conf, confidence_threshold=500)
    assert T is not None
    np.testing.assert_allclose(scale, 1.6, rtol=1e-3)
    # T maps GT translations onto estimates
    mapped = gt[:, :3, 3] @ T[:3, :3].T + T[:3, 3]
    errs = np.linalg.norm(mapped - est[:, :3, 3], axis=1)
    assert np.median(errs) < 1e-3


def test_alignment_too_few_confident(rng):
    gt, est, conf, _ = _make_pose_sets(rng, n=20)
    conf[:] = 0.0  # nothing confident
    T, scale = estimate_alignment(est, gt, conf, confidence_threshold=500)
    assert T is None and scale == 1.0


def test_evaluate_poses_accuracy(rng):
    gt, est, conf, _ = _make_pose_sets(rng, n=40, outliers=6)
    entries = [
        PoseFileEntry(f"f_{i:03d}.png", np.linalg.inv(est[i]), 500.0, conf[i])
        for i in range(40)
    ]
    errors = evaluate_poses(entries, list(gt))
    assert errors.aligned
    # 34 clean poses within thresholds, 6 outliers beyond
    assert 80.0 <= errors.accuracy <= 87.0, errors.accuracy
    assert errors.median_trans_cm < 1.0
    assert errors.median_rot_deg < 0.5


def test_evaluate_poses_alignment_failure_gives_inf(rng):
    gt, est, conf, _ = _make_pose_sets(rng, n=12)
    entries = [
        PoseFileEntry(f"f_{i:03d}.png", np.linalg.inv(est[i]), 500.0, 0.0)
        for i in range(12)
    ]
    errors = evaluate_poses(entries, list(gt))
    assert not errors.aligned
    assert errors.accuracy == 0.0
    assert np.isinf(errors.median_trans_cm)
