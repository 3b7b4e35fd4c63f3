"""Analytic GT scene-coordinate rendering for synthetic corpus scenes.

The pretraining augmentation (in-plane rotation + scale about the principal
point) turns each view into *another pinhole camera* of the same scene:
w2c' = Rz(theta) @ w2c and f' = s * f. Instead of warping the stride-8 GT
coordinate map (order-0 warp of a coarse map costs up to half a cell ~4 px of
supervision misalignment — measured ~3 px median), we re-render the exact
coordinate grid for the augmented camera by ray-casting the scene's boxes
(interior AABB + occluders) in pure jnp. Supervision error drops to float
round-off.

Mirrors the numpy renderer in acezero_tpu/data/synthetic.py:render_scene;
geometry comes from SyntheticScene.box_half / occ_boxes. Padded occluder
slots use the PAD_BOX sentinel (a far-away degenerate box that never wins
the depth test), so scenes with different occluder counts batch into one
fixed-shape array.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

PAD_BOX_COORD = 1.0e9


def pad_occ_boxes(occ_boxes_list: list[np.ndarray], max_boxes: int) -> np.ndarray:
    """Stack per-scene (K_i, 2, 3) occluder arrays into (S, max_boxes, 2, 3)."""
    out = np.full((len(occ_boxes_list), max_boxes, 2, 3), PAD_BOX_COORD, np.float32)
    for i, boxes in enumerate(occ_boxes_list):
        k = 0 if boxes is None else boxes.shape[0]
        if k:
            out[i, :k] = boxes
    return out


def render_coord_grid(
    box_half: jax.Array,
    occ_boxes: jax.Array,
    c2w: jax.Array,
    focal: jax.Array,
    ppx: jax.Array,
    ppy: jax.Array,
    h_cells: int,
    w_cells: int,
    subsample: int = 8,
) -> jax.Array:
    """Exact world-coordinate grid (h_cells, w_cells, 3) for one camera.

    Cell targets sit at ((k + 0.5) * subsample) full-res pixels, the same
    convention as the registrar sampling grid (reference createSampling,
    /root/reference/dsacstar/dsacstar_util.h:59-76: x*8+4).
    """
    xs = (jnp.arange(w_cells, dtype=jnp.float32) + 0.5) * subsample
    ys = (jnp.arange(h_cells, dtype=jnp.float32) + 0.5) * subsample
    u, v = jnp.meshgrid(xs, ys)
    d_cam = jnp.stack(
        [(u - ppx) / focal, (v - ppy) / focal, jnp.ones_like(u)], axis=-1
    )
    R = c2w[:3, :3]
    origin = c2w[:3, 3]
    d_world = d_cam @ R.T  # (h, w, 3)

    safe_d = jnp.where(jnp.abs(d_world) < 1e-12, 1e-12, d_world)

    # interior walls: last axis-plane exit along the ray
    t_lo = (-box_half - origin) / safe_d
    t_hi = (box_half - origin) / safe_d
    t_far = jnp.maximum(t_lo, t_hi)
    t_exit = jnp.min(t_far, axis=-1)

    def box_entry(t_hit, box):
        lo, hi = box[0], box[1]
        t0 = (lo - origin) / safe_d
        t1 = (hi - origin) / safe_d
        t_near_b = jnp.max(jnp.minimum(t0, t1), axis=-1)
        t_far_b = jnp.min(jnp.maximum(t0, t1), axis=-1)
        hit = (t_near_b <= t_far_b) & (t_far_b > 0) & (t_near_b > 1e-3)
        t_entry = jnp.where(hit, t_near_b, jnp.inf)
        return jnp.minimum(t_hit, t_entry), None

    t_hit, _ = jax.lax.scan(box_entry, t_exit, occ_boxes)
    return origin + d_world * t_hit[..., None]


def render_coord_grid_batch(
    box_half: jax.Array,  # (B,)
    occ_boxes: jax.Array,  # (B, K, 2, 3)
    c2w: jax.Array,  # (B, 4, 4)
    focal: jax.Array,  # (B,)
    ppx: jax.Array,
    ppy: jax.Array,
    h_cells: int,
    w_cells: int,
    subsample: int = 8,
) -> jax.Array:
    return jax.vmap(
        lambda bh, ob, p, f: render_coord_grid(
            bh, ob, p, f, ppx, ppy, h_cells, w_cells, subsample
        )
    )(box_half, occ_boxes, c2w, focal)
