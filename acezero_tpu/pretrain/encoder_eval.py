"""Encoder quality evaluation: fast, training-free (and short-training) probes.

Round-2 finding: encoder pretraining outcome varies wildly between runs with
identical configs (cross-view match@10cm anywhere from ~27% to ~57% for the
same recipe), and downstream reconstruction accuracy tracks these probes far
better than the pretraining loss does. Two complementary metrics:

  match_score     — cross-view nearest-neighbor feature matching accuracy on
                    held-out synthetic scenes (no training; seconds). Measures
                    feature injectivity/distinctiveness — what registration
                    needs. NN matching alone does NOT guarantee a scene head
                    can regress coordinates from the features (a contrastive-
                    only encoder hit 70% match yet was unfittable), hence:
  shortfit_score  — train a small scene map for a few thousand iterations on
                    a held-out scene and measure the reprojection fit.
                    Measures MLP-fittability — what mapping needs.

Both use generator seeds >= 8000 (reserved: never in pretraining corpora or
the held-out accuracy suite at 7000+).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

import numpy as np

_logger = logging.getLogger(__name__)

# seeds 8000+ reserved for encoder evaluation
EVAL_SCENES = [
    dict(seed=8001, look="across", focal=520.0, n_occluders=2),
    dict(seed=8002, look="across", focal=700.0, n_occluders=1),
]


@dataclass
class EncoderScores:
    match_at_10cm: float  # percent
    shortfit_inlier10: float | None = None  # percent cells < 10 px
    shortfit_med_px: float | None = None

    @property
    def combined(self) -> float:
        """Selection score: fittability dominates, matching tie-breaks."""
        if self.shortfit_inlier10 is None:
            return self.match_at_10cm
        return self.shortfit_inlier10 + 0.25 * self.match_at_10cm


def match_score(
    encoder_params,
    n_views: int = 24,
    h: int = 480,
    w: int = 640,
    tau_vis: float = 0.05,
    tau_match: float = 0.10,
) -> float:
    """Cross-view NN feature matching accuracy (percent) on eval scenes."""
    import jax
    import jax.numpy as jnp

    from acezero_tpu.data.augment import normalize_images
    from acezero_tpu.data.synthetic import render_scene, scene_coordinate_maps
    from acezero_tpu.models.encoder import encoder_apply

    accs = []
    for kw in EVAL_SCENES:
        sc = render_scene(n_views, h=h, w=w, **kw)
        gt = scene_coordinate_maps(sc)
        x = normalize_images(jnp.asarray(sc.images_u8))
        f = np.asarray(encoder_apply(encoder_params, x)).astype(np.float32)
        # adjacent ring views overlap; distant ones often do not
        for a in range(0, n_views - 1, max(1, n_views // 4)):
            b = a + 1
            fa = f[a].reshape(-1, f.shape[-1])
            fb = f[b].reshape(-1, f.shape[-1])
            fa = fa / (np.linalg.norm(fa, axis=1, keepdims=True) + 1e-9)
            fb = fb / (np.linalg.norm(fb, axis=1, keepdims=True) + 1e-9)
            nn = (fa @ fb.T).argmax(1)
            ga = gt[a].reshape(-1, 3)
            gb = gt[b].reshape(-1, 3)
            d_gt = np.linalg.norm(ga[:, None, :] - gb[None, :, :], axis=-1)
            vis = d_gt.min(1) < tau_vis
            if vis.sum() < 50:
                continue
            d = np.linalg.norm(ga - gb[nn], axis=1)
            accs.append((d[vis] < tau_match).mean())
    return float(np.mean(accs) * 100.0) if accs else float("nan")


def shortfit_score(
    encoder_params,
    iterations: int = 6000,
    n_views: int = 40,
    h: int = 480,
    w: int = 640,
) -> tuple[float, float]:
    """(inlier10 percent, median reproj px) of a short scene-map fit."""
    import tempfile
    from pathlib import Path

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from acezero_tpu.data.augment import normalize_images
    from acezero_tpu.data.canvas_geom import content_mask
    from acezero_tpu.data.scene import load_scene
    from acezero_tpu.data.synthetic import render_scene
    from acezero_tpu.geometry.projection import get_pixel_grid
    from acezero_tpu.models.encoder import encoder_apply
    from acezero_tpu.models.head import HeadConfig, head_apply_image
    from acezero_tpu.training.buffer import BufferConfig
    from acezero_tpu.training.loss import ReproLossConfig
    from acezero_tpu.training.schedule import ScheduleConfig
    from acezero_tpu.training.trainer import MappingTrainer, TrainConfig

    kw = EVAL_SCENES[0]
    sc = render_scene(n_views, h=h, w=w, **kw)
    with tempfile.TemporaryDirectory() as td:
        tdp = Path(td)
        for i in range(n_views):
            Image.fromarray(sc.images_u8[i]).save(tdp / f"f_{i:04d}.png")
            np.savetxt(tdp / f"f_{i:04d}_pose.txt", sc.poses_c2w[i])
        scene = load_scene(
            str(tdp / "*.png"),
            pose_files=str(tdp / "*_pose.txt"),
            external_focal_length=float(sc.focal),
        )
    head_cfg = HeadConfig(num_head_blocks=1)
    cfg = TrainConfig(
        batch_size=5120,
        schedule=ScheduleConfig(
            schedule="1cyclepoly",
            iterations=iterations,
            learning_rate_max=0.003,
            warmup_iterations=500,
            cooldown_iterations=1000,
        ),
        loss=ReproLossConfig(total_iterations=iterations, loss_type="tanh"),
        pose_refinement="none",
        refine_calibration=False,
    )
    tr = MappingTrainer(scene, encoder_params, head_cfg, cfg, BufferConfig())
    res = tr.train()

    H, W = scene.images.canvas_hw
    grid = np.asarray(get_pixel_grid(H // 8, W // 8))
    meds, inl = [], []
    for i in range(0, n_views, max(1, n_views // 6)):
        img = jnp.asarray(scene.images.canvases[i : i + 1])
        m = content_mask(H, W, jnp.asarray(scene.images.sizes[i : i + 1]))
        x = jnp.where(m[..., None], normalize_images(img), 0.0)
        feats = encoder_apply(encoder_params, x)
        coords = np.asarray(
            head_apply_image(res["head_params"], head_cfg, feats)
        ).astype(np.float32)[0]
        w2c = np.linalg.inv(scene.poses_c2w[i].astype(np.float64))
        pc = coords.reshape(-1, 3) @ w2c[:3, :3].T + w2c[:3, 3]
        z = np.maximum(pc[:, 2], 1e-6)
        u = scene.focals_canvas[i] * pc[:, 0] / z + W / 2.0
        v = scene.focals_canvas[i] * pc[:, 1] / z + H / 2.0
        re = np.hypot(u - grid[..., 0].ravel(), v - grid[..., 1].ravel())
        meds.append(np.median(re))
        inl.append((re < 10).mean() * 100)
    return float(np.mean(inl)), float(np.median(meds))


def evaluate_encoder(encoder_params, with_shortfit: bool = True) -> EncoderScores:
    m = match_score(encoder_params)
    if not with_shortfit:
        return EncoderScores(match_at_10cm=m)
    inl, med = shortfit_score(encoder_params)
    _logger.info(
        "encoder eval: match@10cm %.1f%%, shortfit inl10 %.1f%% (med %.1f px)",
        m, inl, med,
    )
    return EncoderScores(match_at_10cm=m, shortfit_inlier10=inl, shortfit_med_px=med)
