"""Robust similarity alignment between estimated and ground-truth pose sets.

Vectorized re-design of the reference's RANSAC alignment
(/root/reference/eval_poses_util.py:71-181): 10k 3-sample Kabsch hypotheses
are solved as one batched computation, inlier counting runs in hypothesis
chunks on device, and the top-K refinement loop uses the weighted Kabsch
(inlier weights) with the same accept-if-better rule. Thresholds, minimal
sample validity check, and the scale convention match the reference.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from acezero_tpu.geometry.kabsch import kabsch_umeyama
from acezero_tpu.geometry.rotations import rotation_angle

_logger = logging.getLogger(__name__)


def estimate_alignment(
    poses_est_c2w: np.ndarray,
    poses_gt_c2w: np.ndarray,
    confidences: np.ndarray,
    confidence_threshold: float = 500.0,
    min_confident: int = 10,
    inlier_threshold_t: float = 0.05,
    inlier_threshold_r: float = 5.0,
    ransac_iterations: int = 10000,
    refinement_max_hyp: int = 12,
    refinement_max_it: int = 8,
    estimate_scale: bool = True,
    seed: int = 0,
):
    """Estimate T aligning GT poses onto estimated poses.

    Returns (T (4,4) with scale folded into the rotation block, scale) or
    (None, 1.0) when alignment fails — the callers then report infinite
    errors (reference eval_poses.py:132-136).
    """
    finite = np.isfinite(poses_gt_c2w).all(axis=(1, 2))
    confident = finite & (confidences > confidence_threshold)
    n_conf = int(confident.sum())
    if n_conf < min_confident:
        _logger.info("Too few confident estimates (%d) for alignment.", n_conf)
        return None, 1.0

    gt = poses_gt_c2w[confident].astype(np.float64)
    est = poses_est_c2w[confident].astype(np.float64)

    rng = np.random.default_rng(seed)
    samples = np.stack([rng.choice(n_conf, 3, replace=False) for _ in range(ransac_iterations)])

    # batched 3-point Kabsch on device
    pts_gt = jnp.asarray(gt[samples][:, :, :3, 3], jnp.float32)  # (H, 3, 3)
    pts_est = jnp.asarray(est[samples][:, :, :3, 3], jnp.float32)
    T_all, s_all = jax.vmap(lambda a, b: kabsch_umeyama(a, b, estimate_scale=estimate_scale))(
        pts_gt, pts_est
    )
    T_all = np.asarray(T_all, np.float64)
    s_all = np.asarray(s_all, np.float64)

    # score hypotheses in chunks (translation + rotation inliers)
    gt_t = gt[:, :3, 3]
    est_t = est[:, :3, 3]
    gt_R = gt[:, :3, :3]
    est_R = est[:, :3, :3]

    scores = np.zeros(ransac_iterations, np.int64)
    minimal_ok = np.zeros(ransac_iterations, bool)
    chunkH = 512
    for h0 in range(0, ransac_iterations, chunkH):
        Tc = T_all[h0 : h0 + chunkH]
        sc = np.maximum(s_all[h0 : h0 + chunkH], 1e-12)
        # translations: (h, n, 3)
        t_new = np.einsum("hab,nb->hna", Tc[:, :3, :3], gt_t) + Tc[:, None, :3, 3]
        dt = np.linalg.norm(t_new - est_t[None], axis=-1)
        # rotations: pure rotation part of T is T[:3,:3]/scale
        R_pure = Tc[:, :3, :3] / sc[:, None, None]
        rel = np.einsum("hab,nbc->hnac", R_pure, gt_R)
        tr = np.einsum("hnab,nab->hn", rel, est_R)
        ang = np.arccos(np.clip((tr - 1) / 2, -1, 1))
        inl = (dt < inlier_threshold_t) & (ang < np.deg2rad(inlier_threshold_r))
        scores[h0 : h0 + chunkH] = inl.sum(axis=1)
        minimal_ok[h0 : h0 + chunkH] = np.take_along_axis(
            inl, samples[h0 : h0 + chunkH], axis=1
        ).sum(axis=1) >= 3

    valid_hyp = minimal_ok & (scores > 0)
    if not valid_hyp.any():
        _logger.info("No valid RANSAC alignment hypothesis.")
        return None, 1.0

    order = np.argsort(-np.where(valid_hyp, scores, -1))[:refinement_max_hyp]

    def inliers_of(T, scale):
        t_new = gt_t @ T[:3, :3].T + T[:3, 3]
        dt = np.linalg.norm(t_new - est_t, axis=-1)
        R_pure = T[:3, :3] / max(scale, 1e-12)
        rel = np.einsum("ab,nbc->nac", R_pure, gt_R)
        tr = np.einsum("nab,nab->n", rel, est_R)
        ang = np.arccos(np.clip((tr - 1) / 2, -1, 1))
        return (dt < inlier_threshold_t) & (ang < np.deg2rad(inlier_threshold_r))

    best_T, best_scale, best_score = None, 1.0, -1
    for h in order:
        T, scale, score = T_all[h], s_all[h], scores[h]
        inl = inliers_of(T, scale)
        for _ in range(refinement_max_it):
            w = jnp.asarray(inl, jnp.float32)
            T_new, s_new = kabsch_umeyama(
                jnp.asarray(gt_t, jnp.float32),
                jnp.asarray(est_t, jnp.float32),
                weights=w,
                estimate_scale=estimate_scale,
            )
            T_new = np.asarray(T_new, np.float64)
            s_new = float(s_new)
            inl_new = inliers_of(T_new, s_new)
            if inl_new.sum() > score:
                T, scale, score, inl = T_new, s_new, inl_new.sum(), inl_new
            else:
                break
        if score > best_score:
            best_T, best_scale, best_score = T, float(scale), score

    _logger.info(
        "Alignment: best hypothesis has %d/%d inliers, scale %.4f",
        best_score,
        n_conf,
        best_scale,
    )
    return best_T, best_scale
