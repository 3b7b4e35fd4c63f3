"""Vectorized RANSAC pose registrar — the TPU-native DSAC* replacement.

One jitted program registers a whole batch of frames: every stage of the
reference C++ pipeline (/root/reference/dsacstar/dsacstar.cpp:66-186) is
re-expressed as fixed-shape batched math so frames × hypotheses × tries run
as one device computation instead of per-frame OpenMP loops:

  sampleHypotheses (dsacstar_util.h:135-221)  -> categorical draw + batched
                                                 Grunert P3P + 4th-point
                                                 disambiguation + validation
  getReproErrs     (dsacstar_util.h:356-446)  -> clamped batched projection
  getHypScores     (dsacstar_util.h:316-343)  -> masked soft-inlier sum,
                                                 beta = 5/threshold, scaled
                                                 alpha / num_valid_cells
  draw(argmax)     (dsacstar_util.h:727-752)  -> argmax over scores
  refineHyp        (dsacstar_util.h:522-597)  -> fixed-step masked LM refits,
                                                 best-inlier-count tracking

Constants keep the reference defaults (threshold 10 px, alpha 100, max
reprojection error 100 px, 16 sampling retries when orchestrated).
The returned confidence is the final inlier count, the registration-rate
currency of the whole ACE0 loop.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from acezero_tpu.geometry.rotations import matrix_to_rodrigues, rodrigues_to_matrix
from acezero_tpu.geometry.transforms import invert_se3, make_se3
from acezero_tpu.registration.lm import lm_pnp, reprojection_errors
from acezero_tpu.registration.p3p import p3p_grunert
from acezero_tpu.utils.precision import f32_matmul


@dataclass(frozen=True)
class RansacConfig:
    hypotheses: int = 64  # reference default; orchestrator passes 32
    max_tries: int = 16  # re-sampling attempts per hypothesis (ace_zero.py:233)
    inlier_threshold: float = 10.0  # px
    inlier_alpha: float = 100.0
    max_reproj_error: float = 100.0  # px, error clamp
    subsample: int = 8
    # max masked-inlier refits; the loop early-stops per frame when the
    # inlier count stops growing, exactly like refineHyp (MAX_REF_STEPS=100,
    # /root/reference/dsacstar/dsacstar.cpp:47, dsacstar_util.h:522-597)
    refinement_steps: int = 100
    lm_iterations: int = 3  # inner LM iterations per refit (J recomputes)
    polish_lm_iterations: int = 3  # minimal-set polish after f32 P3P
    # tight-inlier pose polish (beyond-reference accuracy): after the
    # reference-exact tau=10 refineHyp loop, re-fit the pose a few times on
    # only the cells within `polish_tau` px. The wide tau=10 band is what
    # RANSAC needs to find/score poses on noisy maps, but once converged it
    # averages ~2x more map noise into the refit than the tight band
    # (measured on a 2400-frame chess-scale final map: 95.1% -> 99.7%
    # @5cm/5deg, median t 1.97 -> 1.51 cm). Guards: the polish only engages
    # with >= 16 tight inliers and is rolled back if the coarse inlier
    # count drops by more than 2 (degenerate tight subsets on early noisy
    # maps keep the reference pose). 0 disables.
    polish_tau: float = 5.0
    polish_steps: int = 6


def _bearings(px: jax.Array, focal, ppx, ppy) -> jax.Array:
    f = jnp.stack(
        [
            (px[..., 0] - ppx) / focal,
            (px[..., 1] - ppy) / focal,
            jnp.ones_like(px[..., 0]),
        ],
        axis=-1,
    )
    return f / jnp.linalg.norm(f, axis=-1, keepdims=True)


@f32_matmul
def _sample_hypotheses(key, pts, px, logits, focal, ppx, ppy, cfg: RansacConfig):
    """Draw and solve minimal sets; return per-hypothesis first-valid pose.

    pts: (N, 3) scene coordinates, px: (N, 2) image targets, logits: (N,)
    masked-uniform sampling logits. Returns (rvec (H,3), tvec (H,3),
    valid (H,)).
    """
    H, T = cfg.hypotheses, cfg.max_tries
    idx = jax.random.categorical(key, logits, shape=(H, T, 4))  # (H, T, 4)

    sel_pts = pts[idx]  # (H, T, 4, 3)
    sel_px = px[idx]  # (H, T, 4, 2)
    sel_bear = _bearings(sel_px, focal, ppx, ppy)

    # P3P on the first three points -> up to 4 candidates each
    R, t, valid_c = p3p_grunert(sel_pts[..., :3, :], sel_bear[..., :3, :])
    # (H, T, 4, 3, 3), (H, T, 4, 3), (H, T, 4)

    # disambiguate with the 4th point: pick candidate minimizing its error
    p4 = sel_pts[..., 3, :]  # (H, T, 3)
    u4 = sel_px[..., 3, :]  # (H, T, 2)
    p4_cam = jnp.einsum("htcij,htj->htci", R, p4) + t
    z4 = p4_cam[..., 2]
    z4_safe = jnp.where(jnp.abs(z4) < 1e-9, 1e-9, z4)
    u4_proj = jnp.stack(
        [
            focal * p4_cam[..., 0] / z4_safe + ppx,
            focal * p4_cam[..., 1] / z4_safe + ppy,
        ],
        axis=-1,
    )
    err4 = jnp.linalg.norm(u4_proj - u4[..., None, :], axis=-1)
    err4 = jnp.where(valid_c & (z4 > 0), err4, jnp.inf)
    best_c = jnp.argmin(err4, axis=-1)  # (H, T)

    R_best = jnp.take_along_axis(R, best_c[..., None, None, None], axis=2).squeeze(2)
    t_best = jnp.take_along_axis(t, best_c[..., None, None], axis=2).squeeze(2)
    err4_best = jnp.take_along_axis(err4, best_c[..., None], axis=-1)[..., 0]

    rvec = matrix_to_rodrigues(R_best)  # (H, T, 3)

    # validate pre-polish: all 4 minimal points within the inlier threshold
    # (the Newton-polished quartic is already exact to well under a pixel)
    errs_min = jax.vmap(
        jax.vmap(
            lambda r, tt, p, u: reprojection_errors(
                r, tt, p, u, focal, ppx, ppy, cfg.max_reproj_error
            )
        )
    )(rvec, t_best, sel_pts, sel_px)  # (H, T, 4)
    try_valid = (
        jnp.all(errs_min < cfg.inlier_threshold, axis=-1)
        & jnp.isfinite(err4_best)
        & jnp.isfinite(rvec).all(axis=-1)
        & jnp.isfinite(t_best).all(axis=-1)
    )  # (H, T)

    # first valid try per hypothesis (argmax picks the first True)
    first = jnp.argmax(try_valid, axis=-1)  # (H,)
    hyp_valid = jnp.any(try_valid, axis=-1)
    rvec_h = jnp.take_along_axis(rvec, first[:, None, None], axis=1)[:, 0]
    tvec_h = jnp.take_along_axis(t_best, first[:, None, None], axis=1)[:, 0]

    # polish ONLY the selected hypotheses (T x fewer LM solves than polishing
    # every try; the scores/refits downstream absorb any residual f32 noise)
    if cfg.polish_lm_iterations > 0:
        sel_pts_h = jnp.take_along_axis(sel_pts, first[:, None, None, None], axis=1)[:, 0]
        sel_px_h = jnp.take_along_axis(sel_px, first[:, None, None, None], axis=1)[:, 0]
        w4 = jnp.ones((H, 4), jnp.float32)
        rvec_h, tvec_h, _ = jax.vmap(
            lambda r0, t0, p, u, w: lm_pnp(
                r0, t0, p, u, w, focal, ppx, ppy, iterations=cfg.polish_lm_iterations
            )
        )(rvec_h, tvec_h, sel_pts_h, sel_px_h, w4)
    return rvec_h, tvec_h, hyp_valid


@f32_matmul
def _refine(rvec0, tvec0, pts, px, mask_f, focal, ppx, ppy, cfg: RansacConfig, max_steps):
    """Iterative masked-inlier refits tracking the best inlier count.

    Reference-exact refineHyp loop (dsacstar_util.h:522-597): refit on the
    current inlier set, accept while the inlier count keeps growing, stop at
    the first non-growth or after `max_steps` refits. Expressed as a
    lax.while_loop so easy frames stop after a handful of refits; under
    vmap, converged lanes are masked while stubborn frames keep refining up
    to the cap — wall-clock is the slowest frame in the chunk, not
    cap x chunk.

    `max_steps` is a RUNTIME scalar: the two-tier registration budget
    (tier-1 16 / tier-2 100) and the capped seed-scoring budget all run on
    ONE compiled program instead of one per cap (each distinct program pays
    a large first-call cost on the shared-host relay).
    """

    def count_and_mask(rvec, tvec):
        errs = reprojection_errors(
            rvec, tvec, pts, px, focal, ppx, ppy, cfg.max_reproj_error
        )
        inl = (errs < cfg.inlier_threshold) & (mask_f > 0)
        return inl.astype(jnp.float32), jnp.sum(inl.astype(jnp.int32))

    def cond(state):
        _, _, _, _, _, growing, steps = state
        return growing & (steps < max_steps)

    def body(state):
        rvec, tvec, best_count, best_rvec, best_tvec, _, steps = state
        w, count = count_and_mask(rvec, tvec)
        improved = count > best_count
        best_count = jnp.where(improved, count, best_count)
        best_rvec = jnp.where(improved, rvec, best_rvec)
        best_tvec = jnp.where(improved, tvec, best_tvec)
        new_rvec, new_tvec, _ = lm_pnp(
            rvec, tvec, pts, px, w, focal, ppx, ppy, iterations=cfg.lm_iterations
        )
        return (new_rvec, new_tvec, best_count, best_rvec, best_tvec, improved, steps + 1)

    # reference starts with bestInliers = 4 (the minimal set); the first
    # iteration always runs (growing init True)
    init = (
        rvec0,
        tvec0,
        jnp.asarray(4, jnp.int32),
        rvec0,
        tvec0,
        jnp.asarray(True),
        jnp.asarray(0, jnp.int32),
    )
    rvec, tvec, best_count, best_rvec, best_tvec, growing, steps = jax.lax.while_loop(
        cond, body, init
    )
    # final chance for the last refit to win
    _, count = count_and_mask(rvec, tvec)
    improved = count > best_count
    best_count = jnp.where(improved, count, best_count)
    best_rvec = jnp.where(improved, rvec, best_rvec)
    best_tvec = jnp.where(improved, tvec, best_tvec)
    # still growing when the step cap cut the loop short (not natural
    # convergence) — the driver re-runs such frames with a bigger budget
    hit_cap = growing & (steps >= max_steps)
    return best_rvec, best_tvec, best_count, hit_cap


@f32_matmul
def _tight_polish(rvec, tvec, inliers, pts, px, mask_f, focal, ppx, ppy, cfg):
    """Fixed-step tight-inlier re-fit of a converged pose (see
    RansacConfig.polish_tau). Keeps the reference confidence semantics: the
    returned inlier count is the tau=10 count of the RETURNED pose."""

    def body(carry, tau):
        rv, tv = carry
        errs_p = reprojection_errors(
            rv, tv, pts, px, focal, ppx, ppy, cfg.max_reproj_error
        )
        w_p = ((errs_p < tau) & (mask_f > 0)).astype(jnp.float32)
        enough = jnp.sum(w_p) >= 16
        rv2, tv2, _ = lm_pnp(
            rv, tv, pts, px, w_p, focal, ppx, ppy, iterations=cfg.lm_iterations
        )
        keep = enough & jnp.all(jnp.isfinite(rv2)) & jnp.all(jnp.isfinite(tv2))
        return (jnp.where(keep, rv2, rv), jnp.where(keep, tv2, tv)), None

    # anneal the band: first half of the steps at polish_tau, second half at
    # polish_tau/2 — once the pose sits inside the tau band, the tighter
    # band averages less map noise into the fit (per-step >=16-inlier guard
    # and the final rollback below bound the risk on degenerate frames)
    taus = jnp.where(
        jnp.arange(cfg.polish_steps) < (cfg.polish_steps + 1) // 2,
        jnp.asarray(cfg.polish_tau, jnp.float32),
        jnp.asarray(cfg.polish_tau / 2.0, jnp.float32),
    )
    (rvec_p, tvec_p), _ = jax.lax.scan(body, (rvec, tvec), taus)
    errs10 = reprojection_errors(
        rvec_p, tvec_p, pts, px, focal, ppx, ppy, cfg.max_reproj_error
    )
    n10 = jnp.sum((errs10 < cfg.inlier_threshold) & (mask_f > 0)).astype(jnp.int32)
    # roll back if the polish cost more than 2 coarse inliers (degenerate
    # tight subset on an early noisy map)
    accept = n10 + 2 >= inliers
    rvec = jnp.where(accept, rvec_p, rvec)
    tvec = jnp.where(accept, tvec_p, tvec)
    inliers = jnp.where(accept, n10, inliers)
    return rvec, tvec, inliers


@partial(jax.jit, static_argnames=("cfg",))
@f32_matmul
def estimate_pose(
    key: jax.Array,
    scene_coords: jax.Array,
    valid_mask: jax.Array,
    pixel_grid: jax.Array,
    focal: jax.Array,
    ppx: jax.Array,
    ppy: jax.Array,
    cfg: RansacConfig = RansacConfig(),
    max_refine_steps: jax.Array | None = None,
):
    """Estimate one camera pose from a scene-coordinate prediction.

    Args:
      key: PRNG key for hypothesis sampling.
      scene_coords: (h, w, 3) predicted world coordinates (subsampled grid).
      valid_mask: (h, w) bool — False for padded canvas cells.
      pixel_grid: (h, w, 2) full-res pixel targets of the cells.
      focal, ppx, ppy: intrinsics in full-res pixels.
      max_refine_steps: optional RUNTIME refineHyp cap overriding
        cfg.refinement_steps (lets different budgets share one program).

    Returns:
      dict with pose_c2w (4, 4), inlier_count (int32; the confidence),
      score (float32 soft-inlier score of the selected hypothesis), and
      valid (bool — False if no hypothesis could be sampled).
    """
    if max_refine_steps is None:
        max_refine_steps = jnp.asarray(cfg.refinement_steps, jnp.int32)
    h, w = scene_coords.shape[:2]
    pts = scene_coords.reshape(-1, 3)
    px = pixel_grid.reshape(-1, 2)
    mask_f = valid_mask.reshape(-1).astype(jnp.float32)
    logits = jnp.where(mask_f > 0, 0.0, -jnp.inf)

    rvec_h, tvec_h, hyp_valid = _sample_hypotheses(
        key, pts, px, logits, focal, ppx, ppy, cfg
    )

    # score every hypothesis: soft inlier count over valid cells
    errs = jax.vmap(
        lambda r, t: reprojection_errors(
            r, t, pts, px, focal, ppx, ppy, cfg.max_reproj_error
        )
    )(rvec_h, tvec_h)  # (H, N)
    beta = 5.0 / cfg.inlier_threshold
    soft = jax.nn.sigmoid(-beta * (errs - cfg.inlier_threshold))
    n_valid = jnp.maximum(jnp.sum(mask_f), 1.0)
    scores = cfg.inlier_alpha * jnp.sum(soft * mask_f, axis=-1) / n_valid
    scores = jnp.where(hyp_valid, scores, -jnp.inf)

    best_h = jnp.argmax(scores)
    any_valid = jnp.any(hyp_valid)

    rvec, tvec, inliers, hit_cap = _refine(
        rvec_h[best_h], tvec_h[best_h], pts, px, mask_f, focal, ppx, ppy, cfg,
        max_refine_steps,
    )

    if cfg.polish_steps > 0 and cfg.polish_tau > 0:
        rvec, tvec, inliers = _tight_polish(
            rvec, tvec, inliers, pts, px, mask_f, focal, ppx, ppy, cfg
        )

    R = rodrigues_to_matrix(rvec)
    pose_w2c = make_se3(R, tvec)
    pose_c2w = invert_se3(pose_w2c)

    pose_c2w = jnp.where(any_valid, pose_c2w, jnp.eye(4))
    inliers = jnp.where(any_valid, inliers, 0)
    return {
        "pose_c2w": pose_c2w,
        "inlier_count": inliers,
        "score": scores[best_h],
        "valid": any_valid,
        "hit_cap": hit_cap & any_valid,
    }


@partial(jax.jit, static_argnames=("cfg",))
def estimate_poses_batch(
    key: jax.Array,
    scene_coords: jax.Array,
    valid_masks: jax.Array,
    pixel_grid: jax.Array,
    focals: jax.Array,
    ppxs: jax.Array,
    ppys: jax.Array,
    cfg: RansacConfig = RansacConfig(),
    max_refine_steps: jax.Array | None = None,
):
    """Register a whole batch of frames in one device computation.

    scene_coords: (B, h, w, 3); valid_masks: (B, h, w); focals/ppxs/ppys:
    (B,). Returns the same dict as `estimate_pose` with a leading B axis.
    """
    B = scene_coords.shape[0]
    keys = jax.random.split(key, B)
    return jax.vmap(
        lambda k, sc, m, f, px_, py_: estimate_pose(
            k, sc, m, pixel_grid, f, px_, py_, cfg, max_refine_steps
        )
    )(keys, scene_coords, valid_masks, focals, ppxs, ppys)
