import pytest
import numpy as np

from acezero_tpu.data.synthetic import render_scene, scene_coordinate_maps
from acezero_tpu.pretrain import PretrainConfig, pretrain_encoder


def test_synthetic_scene_consistency():
    scene = render_scene(4, h=64, w=96, seed=1)
    assert scene.images_u8.shape == (4, 64, 96)
    assert np.isfinite(scene.depth).all()
    maps = scene_coordinate_maps(scene)
    assert maps.shape == (4, 8, 12, 3)
    # all points lie inside (or on) the scene box
    assert np.abs(maps).max() < 10.0
    # multi-view consistency: reproject frame-1 coords into frame 0's camera
    w2c0 = np.linalg.inv(scene.poses_c2w[0].astype(np.float64))
    p_cam = maps[0].reshape(-1, 3) @ w2c0[:3, :3].T + w2c0[:3, 3]
    z = p_cam[:, 2]
    assert (z > 0).all()
    u = scene.focal * p_cam[:, 0] / z + 48.0
    v = scene.focal * p_cam[:, 1] / z + 32.0
    grid_u = (np.arange(12)[None, :].repeat(8, 0).reshape(-1) + 0.5) * 8
    grid_v = (np.arange(8)[:, None].repeat(12, 1).reshape(-1) + 0.5) * 8
    err = np.abs(u - grid_u) + np.abs(v - grid_v)
    assert np.median(err) < 0.1, f"self-reprojection err {np.median(err)}"


@pytest.mark.slow
def test_pretrain_smoke_loss_decreases():
    cfg = PretrainConfig(
        num_scenes=2,
        views_per_scene=4,
        image_h=64,
        image_w=96,
        steps=60,
        batch_images=2,
        chunk_steps=20,
        use_aug=False,
    )
    result = pretrain_encoder(cfg)
    hist = result["history"]
    assert len(hist) == 3
    assert np.isfinite([h["loss"] for h in hist]).all()
    assert hist[-1]["coord_l2"] < hist[0]["coord_l2"], (
        f"coord loss did not decrease: {[h['coord_l2'] for h in hist]}"
    )
    # exported encoder pytree has the expected conv stack
    assert "res2_conv3" in result["encoder"]
