"""Device-side point-splat renderer for reconstruction videos.

Replaces the reference's pyrender/EGL offscreen pipeline
(/root/reference/ace_visualizer.py:718-749) with a dependency-free z-buffer
point splatter that runs as one jitted program on the TPU: project, depth
sort via scatter-min, splat with a small square footprint. Camera frustums
are rasterized as dense line-segment point sets through the same path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("h", "w", "splat"))
def render_point_cloud(
    xyz: jax.Array,
    rgb: jax.Array,
    pose_w2c: jax.Array,
    focal: jax.Array,
    h: int,
    w: int,
    splat: int = 2,
    background: float = 1.0,
):
    """Render points (n, 3) with colors (n, 3 in [0,1]) to an (h, w, 3) image."""
    R = pose_w2c[:3, :3]
    t = pose_w2c[:3, 3]
    p_cam = xyz @ R.T + t
    z = p_cam[:, 2]
    valid = z > 0.05
    z_safe = jnp.where(valid, z, 1.0)
    u = focal * p_cam[:, 0] / z_safe + w / 2.0
    v = focal * p_cam[:, 1] / z_safe + h / 2.0

    # replicate each point over its splat footprint -> one scatter pass
    flats, zs, cols = [], [], []
    for dy in range(splat):
        for dx in range(splat):
            ui = jnp.clip(jnp.floor(u).astype(jnp.int32) + dx, 0, w - 1)
            vi = jnp.clip(jnp.floor(v).astype(jnp.int32) + dy, 0, h - 1)
            flats.append(jnp.where(valid, vi * w + ui, h * w))  # dummy slot h*w
            zs.append(jnp.where(valid, z, jnp.inf))
            cols.append(rgb)
    flat = jnp.concatenate(flats)
    zp = jnp.concatenate(zs)
    col = jnp.concatenate(cols)

    # pass 1: depth buffer via scatter-min; pass 2: only winners write color,
    # losers are routed to the dummy slot (duplicate-index scatter order is
    # unspecified, so losers must not write their pixel at all)
    zbuf = jnp.full((h * w + 1,), jnp.inf, jnp.float32).at[flat].min(zp)
    won = zp <= zbuf[flat] * (1.0 + 1e-6)
    flat_final = jnp.where(won, flat, h * w)
    img = jnp.full((h * w + 1, 3), background, jnp.float32).at[flat_final].set(col)
    return img[: h * w].reshape(h, w, 3)


def frustum_line_points(pose_c2w: np.ndarray, size: float, samples: int = 24) -> np.ndarray:
    """Dense points along the 8 edges of a camera frustum (world space)."""
    s = size
    corners = np.array(
        [
            [0.0, 0.0, 0.0],
            [-s, -0.75 * s, 1.6 * s],
            [s, -0.75 * s, 1.6 * s],
            [s, 0.75 * s, 1.6 * s],
            [-s, 0.75 * s, 1.6 * s],
        ]
    )
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (4, 1)]
    ts = np.linspace(0.0, 1.0, samples)[:, None]
    pts = np.concatenate(
        [corners[a] * (1 - ts) + corners[b] * ts for a, b in edges]
    )
    return pts @ pose_c2w[:3, :3].T + pose_c2w[:3, 3]


def render_cameras(
    poses_c2w: np.ndarray,
    colors: np.ndarray,
    pose_w2c_view: np.ndarray,
    focal: float,
    h: int,
    w: int,
    marker_size: float = 0.03,
):
    """Rasterize camera frustums: returns (xyz, rgb) point sets for splatting."""
    pts, cols = [], []
    for pose, color in zip(poses_c2w, colors):
        p = frustum_line_points(pose, marker_size)
        pts.append(p)
        cols.append(np.tile(color, (p.shape[0], 1)))
    if not pts:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32)
    return np.concatenate(pts).astype(np.float32), np.concatenate(cols).astype(np.float32)


def composite_frame(
    cloud_xyz: np.ndarray,
    cloud_rgb: np.ndarray,
    camera_xyz: np.ndarray,
    camera_rgb: np.ndarray,
    pose_w2c_view: np.ndarray,
    focal: float,
    h: int,
    w: int,
) -> np.ndarray:
    """One video frame: point cloud + camera markers, uint8 (h, w, 3)."""
    xyz = np.concatenate([cloud_xyz, camera_xyz]) if camera_xyz.size else cloud_xyz
    rgb = np.concatenate([cloud_rgb, camera_rgb]) if camera_rgb.size else cloud_rgb
    if xyz.shape[0] == 0:
        return np.full((h, w, 3), 255, np.uint8)
    img = render_point_cloud(
        jnp.asarray(xyz, jnp.float32),
        jnp.asarray(rgb, jnp.float32),
        jnp.asarray(pose_w2c_view, jnp.float32),
        jnp.asarray(focal, jnp.float32),
        h,
        w,
    )
    return (np.asarray(img) * 255).clip(0, 255).astype(np.uint8)
