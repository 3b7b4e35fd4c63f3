"""Point-cloud extraction from a trained scene map.

Batched port of the reference extraction semantics
(/root/reference/ace_vis_util.py:431-591): per mapping frame, predict scene
coordinates, then filter by
  - spatial smoothness (neighbor-coordinate gradient), with increasingly
    relaxed thresholds [0.1, 0.5, 1.0, inf] m until enough points survive;
  - camera-space depth below `filter_depth`;
  - L1 reprojection error below 1 px, relaxed per frame to keep at least
    `min_points/num_frames` and subsampled above `max_points/num_frames`.
Dense mode disables the gradient/error filters (splat initialization). The
exported cloud is converted to the requested convention (OpenCV or OpenGL
y/z flip) and written as binary PLY — the `pc_final.ply` artifact
(/root/reference/ace_zero.py:378-400).

Colors come from the grayscale canvases when RGB files are unavailable;
with readable RGB files the original colors are sampled at cell centers.
"""

from __future__ import annotations

import logging
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from acezero_tpu.data.augment import normalize_images
from acezero_tpu.data.scene import SceneData
from acezero_tpu.geometry.projection import get_pixel_grid
from acezero_tpu.io.pose_files import PoseFileEntry
from acezero_tpu.io.ply import write_ply_points
from acezero_tpu.models.encoder import encoder_apply
from acezero_tpu.models.head import HeadConfig, head_apply_image

_logger = logging.getLogger(__name__)

GRAD_THRESHOLDS = [0.1, 0.5, 1.0, np.inf]
PC_POINTS_MIN = 100_000
PC_POINTS_MAX = 1_000_000
REPRO_THRESHOLD = 1.0


def _frame_colors(scene: SceneData, idx: int, hs: int, ws: int) -> np.ndarray:
    """(hs*ws, 3) uint8 colors at cell centers; RGB if the file is readable."""
    try:
        from PIL import Image

        with Image.open(scene.rgb_files[idx]) as img:
            rgb = np.asarray(img.convert("RGB"))
        h, w = scene.images.sizes[idx]
        hc, wc = scene.canvas_hw
        img = Image.fromarray(rgb).resize((int(w), int(h)), Image.BILINEAR)
        canvas = np.zeros((hc, wc, 3), np.uint8)
        y0, x0 = (hc - int(h)) // 2, (wc - int(w)) // 2
        canvas[y0 : y0 + int(h), x0 : x0 + int(w)] = np.asarray(img)
        sub = canvas[4::8, 4::8][:hs, :ws]
        return sub.reshape(-1, 3)
    except Exception:  # noqa: BLE001 — synthetic/virtual files
        gray = scene.images.canvases[idx][4::8, 4::8][:hs, :ws]
        return np.stack([gray] * 3, axis=-1).reshape(-1, 3)


def point_cloud_from_network(
    encoder_params,
    head_params,
    head_cfg: HeadConfig,
    scene: SceneData,
    entries: list[PoseFileEntry],
    filter_depth: float = 100.0,
    dense: bool = False,
    convention: str = "opencv",
):
    """Extract (xyz (N,3), rgb (N,3) uint8) from the trained map."""
    by_file = {f: i for i, f in enumerate(scene.rgb_files)}
    frames = [(by_file[e.rgb_file], e) for e in entries if e.rgb_file in by_file]
    n_frames = max(len(frames), 1)
    per_min = PC_POINTS_MIN // n_frames
    per_max = PC_POINTS_MAX // n_frames

    grad_ts = [np.inf] if dense else GRAD_THRESHOLDS
    repro_t = np.inf if dense else REPRO_THRESHOLD

    fwd = jax.jit(
        lambda img: head_apply_image(
            head_params, head_cfg, encoder_apply(encoder_params, normalize_images(img))
        )
    )

    pc_xyz, pc_rgb = [], []
    for idx, entry in frames:
        coords = np.asarray(fwd(jnp.asarray(scene.images.canvases[idx][None])))[0]  # (hs, ws, 3)
        hs, ws = coords.shape[:2]
        grid = np.asarray(get_pixel_grid(hs, ws))

        w2c = entry.pose_w2c
        p_cam = coords @ w2c[:3, :3].T + w2c[:3, 3]
        z = np.maximum(p_cam[..., 2], 0.1)
        f = entry.focal_length * scene.images.scale_factors[idx]
        cx, cy = scene.principal_point
        u = f * p_cam[..., 0] / z + cx
        v = f * p_cam[..., 1] / z + cy
        err = np.abs(u - grid[..., 0]) + np.abs(v - grid[..., 1])

        gx = np.linalg.norm(np.diff(coords, axis=1, prepend=coords[:, :1]), axis=-1)
        gy = np.linalg.norm(np.diff(coords, axis=0, prepend=coords[:1]), axis=-1)
        grad = np.maximum(gx, gy)

        for gt in grad_ts:
            grad_mask = grad < gt
            if grad_mask.sum() > per_min:
                break
        mask = grad_mask & (p_cam[..., 2] < filter_depth)
        if mask.sum() == 0:
            mask[:] = True

        err_mask = (err < repro_t) & mask
        n_valid = int(err_mask.sum())
        if n_valid < per_min:
            pool = err[mask]
            k = min(per_min, pool.size - 1)
            relaxed = np.sort(pool)[k] if pool.size else np.inf
            err_mask = (err < relaxed) & mask
        elif n_valid > per_max:
            flat = np.flatnonzero(err_mask)
            keep = np.random.default_rng(0).choice(flat, per_max, replace=False)
            err_mask = np.zeros_like(err_mask)
            err_mask.reshape(-1)[keep] = True

        sel = err_mask.reshape(-1)
        colors = _frame_colors(scene, idx, hs, ws)
        pc_xyz.append(coords.reshape(-1, 3)[sel])
        pc_rgb.append(colors[sel])

    xyz = np.concatenate(pc_xyz) if pc_xyz else np.zeros((0, 3))
    rgb = np.concatenate(pc_rgb) if pc_rgb else np.zeros((0, 3), np.uint8)

    if convention == "opengl":
        xyz = xyz.copy()
        xyz[:, 1] = -xyz[:, 1]
        xyz[:, 2] = -xyz[:, 2]
    return xyz.astype(np.float32), rgb.astype(np.uint8)


def export_point_cloud_from_network(
    path: str | Path,
    encoder_params,
    head_params,
    head_cfg: HeadConfig,
    scene: SceneData,
    entries: list[PoseFileEntry],
    filter_depth: float = 100.0,
    dense: bool = False,
    convention: str = "opencv",
) -> None:
    xyz, rgb = point_cloud_from_network(
        encoder_params, head_params, head_cfg, scene, entries, filter_depth, dense, convention
    )
    write_ply_points(path, xyz, rgb)
    _logger.info("Exported %d points to %s", xyz.shape[0], path)
