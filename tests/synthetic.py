"""Procedural multi-view test scene: textured room interior with GT depth.

Cameras sit inside an axis-aligned textured box; each pixel ray is
intersected with the box interior and shaded with a smooth multi-frequency
3D texture of the hit point's world position. Views are therefore perfectly
multi-view-consistent with known poses, depths, and intrinsics — the
golden-value substrate for registrar/trainer/end-to-end tests
(SURVEY.md §4 recommendation 2).
"""

from __future__ import annotations

import numpy as np

BOX_HALF = 3.0


def _texture(points: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Smooth deterministic 3D texture in [0, 1] for (..., 3) world points."""
    rng = np.random.default_rng(7)  # texture is scene-intrinsic, fixed seed
    val = np.full(points.shape[:-1], 0.5)
    for freq, amp in [(1.0, 0.15), (2.3, 0.12), (5.1, 0.1), (11.0, 0.08), (23.0, 0.05)]:
        w = rng.normal(size=3)
        w *= freq / np.linalg.norm(w)
        phase = rng.uniform(0, 2 * np.pi)
        val = val + amp * np.sin(points @ w + phase)
    return np.clip(val, 0.0, 1.0)


def _look_at(position: np.ndarray, target: np.ndarray) -> np.ndarray:
    """cam-to-world rotation with +z toward target, OpenCV convention."""
    z = target - position
    z = z / np.linalg.norm(z)
    up = np.array([0.0, -1.0, 0.0])
    if abs(np.dot(up, z)) > 0.95:
        up = np.array([1.0, 0.0, 0.0])
    x = np.cross(up, z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z], axis=1)


def render_room_scene(
    n_views: int,
    h: int = 96,
    w: int = 128,
    focal: float = 110.0,
    seed: int = 0,
    spread: float = 0.8,
):
    """Render n_views grayscale views from inside the textured box.

    Returns dict with images_u8 (N, h, w), poses_c2w (N, 4, 4), depth
    (N, h, w) camera-z depth, focal.
    """
    rng = np.random.default_rng(seed)
    cx, cy = w / 2.0, h / 2.0

    images = np.zeros((n_views, h, w), np.uint8)
    depths = np.zeros((n_views, h, w), np.float32)
    poses = np.zeros((n_views, 4, 4), np.float32)

    # camera ring: positions near the center, looking outward at the walls
    for i in range(n_views):
        angle = 2 * np.pi * i / n_views + rng.normal() * 0.05
        position = np.array(
            [
                spread * np.cos(angle) + rng.normal() * 0.1,
                rng.normal() * 0.2,
                spread * np.sin(angle) + rng.normal() * 0.1,
            ]
        )
        target = position + np.array([np.cos(angle), rng.normal() * 0.2, np.sin(angle)])
        R = _look_at(position, target)

        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = position
        poses[i] = T

        uu, vv = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
        d_cam = np.stack([(uu - cx) / focal, (vv - cy) / focal, np.ones_like(uu)], axis=-1)
        d_world = d_cam @ R.T  # (h, w, 3)

        # exit intersection with the box interior
        t_exit = np.full((h, w), np.inf)
        for axis in range(3):
            d = d_world[..., axis]
            with np.errstate(divide="ignore", invalid="ignore"):
                t_lo = (-BOX_HALF - position[axis]) / d
                t_hi = (BOX_HALF - position[axis]) / d
            t_far = np.maximum(t_lo, t_hi)
            t_far = np.where(np.isfinite(t_far), t_far, np.inf)
            t_exit = np.minimum(t_exit, t_far)

        points = position + d_world * t_exit[..., None]
        images[i] = (_texture(points, rng) * 255).astype(np.uint8)
        depths[i] = t_exit  # camera-z depth: d_cam z-component is 1

    return {
        "images_u8": images,
        "poses_c2w": poses,
        "depth": depths,
        "focal": focal,
    }
