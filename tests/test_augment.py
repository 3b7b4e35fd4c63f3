"""Golden-value checks of the on-device augmentation geometry."""

import jax
import jax.numpy as jnp
import numpy as np

from acezero_tpu.data.augment import augment_batch, normalize_images, warp_target_map
from acezero_tpu.data.images import GRAY_MEAN, GRAY_STD
from synthetic import render_room_scene

from acezero_tpu.data.depth import seed_scene_coordinates


def test_no_aug_is_identity(rng):
    imgs = rng.integers(0, 255, (2, 64, 96), dtype=np.uint8)
    sizes = np.tile(np.asarray([[64, 96]], np.int32), (2, 1))
    out = augment_batch(
        jax.random.PRNGKey(0), jnp.asarray(imgs), jnp.asarray(sizes),
        aug_rotation_deg=15.0, aug_scale_min=2 / 3, aug_scale_max=1.5, enabled=False,
    )
    expected = (imgs.astype(np.float32) / 255.0 - GRAY_MEAN) / GRAY_STD
    np.testing.assert_allclose(np.asarray(out["images"][..., 0]), expected, atol=2e-2)
    assert np.asarray(out["masks"]).all()
    np.testing.assert_allclose(np.asarray(out["scales"]), 1.0)


def test_augmented_supervision_stays_consistent():
    """After warping image+targets, GT coords must reproject onto the cell
    centers through the compensated camera (f*s, Rz(theta) @ w2c) to within
    the order-0 resampling quantization (< ~half a cell)."""
    data = render_room_scene(1, h=96, w=128)
    depth, pose_c2w, focal = data["depth"][0], data["poses_c2w"][0], data["focal"]

    target = seed_scene_coordinates(depth, focal, pose_c2w)  # (12, 16, 3)
    imgs = jnp.asarray(data["images_u8"][:1])
    sizes = jnp.asarray([[96, 128]], jnp.int32)

    aug = augment_batch(
        jax.random.PRNGKey(3), imgs, sizes,
        aug_rotation_deg=15.0, aug_scale_min=2 / 3, aug_scale_max=1.5, enabled=True,
    )
    theta = float(aug["thetas"][0])
    scale = float(aug["scales"][0])
    warped = np.asarray(warp_target_map(jnp.asarray(target), aug["thetas"][0], aug["scales"][0]))
    mask = np.asarray(aug["masks"][0])[4::8, 4::8]

    w2c = np.linalg.inv(pose_c2w)
    c, s = np.cos(theta), np.sin(theta)
    Rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    R_eff = Rz @ w2c[:3, :3]
    t_eff = Rz @ w2c[:3, 3]

    valid = mask & (np.abs(warped).sum(-1) > 1e-5)
    pts = warped[valid]
    p_cam = pts @ R_eff.T + t_eff
    u = focal * scale * p_cam[:, 0] / p_cam[:, 2] + 64.0
    v = focal * scale * p_cam[:, 1] / p_cam[:, 2] + 48.0

    ys, xs = np.nonzero(valid)
    err = np.abs(u - (xs + 0.5) * 8) + np.abs(v - (ys + 0.5) * 8)
    assert np.median(err) < 8.0, f"median consistency error {np.median(err)}px"
    assert np.percentile(err, 90) < 14.0


def test_photometric_jitter_changes_values_not_geometry(rng):
    imgs = rng.integers(40, 200, (1, 64, 96), dtype=np.uint8)
    sizes = jnp.asarray([[64, 96]], jnp.int32)
    out1 = augment_batch(jax.random.PRNGKey(1), jnp.asarray(imgs), sizes,
                         aug_rotation_deg=0.0, aug_scale_min=1.0, aug_scale_max=1.0)
    out2 = augment_batch(jax.random.PRNGKey(2), jnp.asarray(imgs), sizes,
                         aug_rotation_deg=0.0, aug_scale_min=1.0, aug_scale_max=1.0)
    # zero rotation/scale: same masks, different photometrics
    np.testing.assert_array_equal(np.asarray(out1["masks"]), np.asarray(out2["masks"]))
    assert not np.allclose(np.asarray(out1["images"]), np.asarray(out2["images"]))


def test_content_mask_odd_margin_matches_placement():
    """Integer-floor mask must match decode_to_canvas placement exactly when
    the centering margin is odd."""
    import jax.numpy as jnp

    from acezero_tpu.data.canvas_geom import content_mask

    H, W = 16, 16
    h, w = 13, 11  # odd margins: y0 = 1, x0 = 2
    mask = np.asarray(content_mask(H, W, jnp.asarray([[h, w]], jnp.int32)))[0]
    expected = np.zeros((H, W), bool)
    y0, x0 = (H - h) // 2, (W - w) // 2
    expected[y0 : y0 + h, x0 : x0 + w] = True
    np.testing.assert_array_equal(mask, expected)
