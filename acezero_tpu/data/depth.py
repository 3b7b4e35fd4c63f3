"""Seed-depth providers and depth -> scene-coordinate targets.

ACE0 needs metric depth only for the (up to 5) seed images that bootstrap the
reconstruction (/root/reference/ace_zero.py:179-211). The provider is a plug
point exactly as the reference documents (README FAQ, dataset_io.py:189-234):

  - depth files on disk (mm-encoded PNGs or float arrays), the first-class
    path (`--depth_files`);
  - any callable `(rgb_uint8 HxWx3) -> depth_m HxW`, e.g. a ZoeDepth port —
    `zoe_depth_estimator()` wires up the reference's torch.hub model when the
    environment has network + GPU, and raises a clear error otherwise.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Callable, Protocol

import numpy as np
from PIL import Image

from acezero_tpu.geometry.projection import OUTPUT_SUBSAMPLE

_logger = logging.getLogger(__name__)

DepthEstimator = Callable[[np.ndarray], np.ndarray]


def load_depth_file(path: str | Path) -> np.ndarray:
    """Load a depth map; integer images are treated as millimeters
    (/root/reference/dataset.py:300-304)."""
    p = str(path)
    if p.endswith(".npy"):
        depth = np.load(p).astype(np.float64)
        return depth
    img = Image.open(p)
    depth = np.asarray(img).astype(np.float64)
    return depth / 1000.0  # mm -> m


def depth_to_canvas(
    depth: np.ndarray, content_hw: tuple[int, int], canvas_hw: tuple[int, int]
) -> np.ndarray:
    """Resize a depth map to the content size (nearest) and center it on the
    canvas; padding gets depth 0 (= invalid)."""
    h, w = content_hw
    hc, wc = canvas_hw
    img = Image.fromarray(depth.astype(np.float32))
    img = img.resize((w, h), Image.NEAREST)
    out = np.zeros((hc, wc), np.float32)
    y0, x0 = (hc - h) // 2, (wc - w) // 2
    out[y0 : y0 + h, x0 : x0 + w] = np.asarray(img)
    return out


def subsample_depth(depth_canvas: np.ndarray, subsample: int = OUTPUT_SUBSAMPLE) -> np.ndarray:
    """Pick the depth at subsampled cell centers (reference dataset.py:359)."""
    off = subsample // 2
    return depth_canvas[off::subsample, off::subsample]


def seed_scene_coordinates(
    depth_canvas: np.ndarray,
    focal_canvas: float,
    pose_c2w: np.ndarray,
    subsample: int = OUTPUT_SUBSAMPLE,
) -> np.ndarray:
    """Back-project canvas depth into world-space targets (hs, ws, 3).

    Cells with invalid depth (0 or > 1000 m) become all-zero targets, the
    "no ground truth" marker the training loss checks for
    (/root/reference/ace_trainer.py:571-572).
    """
    hc, wc = depth_canvas.shape
    d = subsample_depth(depth_canvas, subsample)
    hs, ws = d.shape
    ys = (np.arange(hs) + 0.5) * subsample
    xs = (np.arange(ws) + 0.5) * subsample
    xx, yy = np.meshgrid(xs, ys)
    cx, cy = wc / 2.0, hc / 2.0
    x = (xx - cx) / focal_canvas * d
    y = (yy - cy) / focal_canvas * d
    p_cam = np.stack([x, y, d], axis=-1)
    R = pose_c2w[:3, :3]
    t = pose_c2w[:3, 3]
    p_world = p_cam @ R.T + t
    valid = (d > 0) & (d <= 1000.0)
    return np.where(valid[..., None], p_world, 0.0).astype(np.float32)


def learned_depth_estimator(
    head_path: str | Path,
    encoder_params: dict | None = None,
    encoder_path: str | Path | None = None,
) -> DepthEstimator:
    """In-process seed-depth estimator (models.depthnet on the ACE encoder).

    Hermetic replacement for the reference's torch.hub ZoeDepth: a bare
    image-glob reconstruction works without --depth_files. Predicts stride-8
    depth (the exact resolution `seed_scene_coordinates` consumes) and
    nearest-upsamples back to pixel resolution for interface compatibility.
    """
    import jax
    import jax.numpy as jnp

    from acezero_tpu.data.images import GRAY_MEAN, GRAY_STD
    from acezero_tpu.models.depthnet import depth_head_apply
    from acezero_tpu.models.encoder import encoder_apply
    from acezero_tpu.models.torch_io import load_encoder

    if encoder_params is None:
        if encoder_path is None:
            raise ValueError("learned_depth_estimator needs encoder params or a path")
        encoder_params = jax.tree.map(jnp.asarray, load_encoder(encoder_path))
    head_params = jax.tree.map(jnp.asarray, load_encoder(head_path))

    @jax.jit
    def _infer(x):
        feats = encoder_apply(encoder_params, x)
        return depth_head_apply(head_params, feats)

    def estimate(image_rgb: np.ndarray) -> np.ndarray:
        img = np.asarray(image_rgb)
        if img.ndim == 3:
            gray = np.asarray(Image.fromarray(img).convert("L"), np.float32)
        else:
            gray = img.astype(np.float32)
        h, w = gray.shape
        hp, wp = -(-h // 8) * 8, -(-w // 8) * 8
        pad = np.zeros((hp, wp), np.float32)
        pad[:h, :w] = gray / 255.0
        x = ((pad - GRAY_MEAN) / GRAY_STD)[None, ..., None]
        d8 = np.asarray(_infer(jnp.asarray(x))[0], np.float64)  # (hp/8, wp/8)
        full = np.repeat(np.repeat(d8, 8, axis=0), 8, axis=1)
        return full[:h, :w]

    return estimate


def zoe_depth_estimator() -> DepthEstimator:
    """The reference's ZoeDepth (torch.hub) as a DepthEstimator.

    Requires network access and a torch-capable device; in hermetic
    environments use `--depth_files` or pass a custom estimator.
    """
    try:
        import torch

        torch.hub.help("intel-isl/MiDaS", "DPT_BEiT_L_384", trust_repo=True)
        model = torch.hub.load("isl-org/ZoeDepth", "ZoeD_NK", pretrained=True, trust_repo=True)
        model.eval()
    except Exception as exc:  # noqa: BLE001
        raise RuntimeError(
            "ZoeDepth is unavailable in this environment (needs torch.hub "
            "network access). Provide --depth_files for the seed images or "
            "plug in a custom DepthEstimator callable."
        ) from exc

    def estimate(image_rgb: np.ndarray) -> np.ndarray:
        import torch

        x = torch.from_numpy(image_rgb.astype(np.float32) / 255.0).permute(2, 0, 1)[None]
        with torch.no_grad():
            depth = model.infer(x)
        return depth.squeeze().cpu().numpy().astype(np.float64)

    return estimate
