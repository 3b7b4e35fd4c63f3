"""Analytic ray-cast GT supervision (acezero_tpu/data/scene_raycast.py).

Pins (1) agreement with the numpy coordinate-map generator and (2) the
augmented-camera convention (w2c' = Rz(theta) @ w2c, f' = s*f) against the
order-0 warped-map path it replaces — the two must agree to within the
warp's inherent half-cell error.
"""

import jax
import jax.numpy as jnp
import numpy as np

from acezero_tpu.data.augment import augment_batch, warp_target_map
from acezero_tpu.data.scene_raycast import (
    pad_occ_boxes,
    render_coord_grid,
    render_coord_grid_batch,
)
from acezero_tpu.data.synthetic import render_scene, scene_coordinate_maps


def test_matches_numpy_coordinate_maps():
    h, w = 96, 128
    scene = render_scene(3, h=h, w=w, seed=11, look="across", n_occluders=2)
    gt_np = scene_coordinate_maps(scene)
    occ = jnp.asarray(pad_occ_boxes([scene.occ_boxes], 4)[0])
    for i in range(3):
        cg = np.asarray(
            render_coord_grid(
                jnp.float32(scene.box_half),
                occ,
                jnp.asarray(scene.poses_c2w[i]),
                jnp.float32(scene.focal),
                jnp.float32(w / 2),
                jnp.float32(h / 2),
                h // 8,
                w // 8,
            )
        )
        d = np.linalg.norm(cg - gt_np[i], axis=-1)
        # numpy maps sample depth at integer pixel index (center +0.5) so a
        # small systematic offset remains; median must be sub-cm-scale
        assert np.median(d) < 0.02, np.median(d)


def test_augmented_camera_convention_agrees_with_warp():
    h, w = 96, 128
    scene = render_scene(4, h=h, w=w, seed=5, look="across", n_occluders=1)
    coords = jnp.asarray(scene_coordinate_maps(scene).astype(np.float32))
    occ = jnp.asarray(
        np.broadcast_to(pad_occ_boxes([scene.occ_boxes], 4)[0], (4, 4, 2, 3))
    )
    aug = augment_batch(
        jax.random.PRNGKey(3),
        jnp.asarray(scene.images_u8),
        jnp.tile(jnp.asarray([[h, w]], jnp.int32), (4, 1)),
        aug_rotation_deg=15.0,
        aug_scale_min=2 / 3,
        aug_scale_max=1.5,
        enabled=True,
    )
    gt_warp = jax.vmap(warp_target_map)(coords, aug["thetas"], aug["scales"])
    mask = np.asarray(
        aug["masks"][:, 4::8, 4::8] & (jnp.sum(jnp.abs(gt_warp), -1) > 1e-5)
    )
    ca, sa = jnp.cos(-aug["thetas"]), jnp.sin(-aug["thetas"])
    z4, o4 = jnp.zeros_like(ca), jnp.ones_like(ca)
    Rz_inv = jnp.stack(
        [ca, -sa, z4, z4, sa, ca, z4, z4, z4, z4, o4, z4, z4, z4, z4, o4], -1
    ).reshape(-1, 4, 4)
    c2w_aug = jnp.einsum(
        "bij,bjk->bik", jnp.asarray(scene.poses_c2w), Rz_inv
    )
    cg = np.asarray(
        render_coord_grid_batch(
            jnp.full((4,), scene.box_half),
            occ,
            c2w_aug,
            jnp.full((4,), scene.focal) * aug["scales"],
            jnp.float32(w / 2),
            jnp.float32(h / 2),
            h // 8,
            w // 8,
        )
    )
    for i in range(4):
        d = np.linalg.norm(cg[i] - np.asarray(gt_warp[i]), axis=-1)[mask[i]]
        # order-0 warp of the stride-8 map has inherent half-cell error
        # (~4 px -> ~5 cm at corpus depth); a convention error would be meters
        assert np.median(d) < 0.15, np.median(d)
