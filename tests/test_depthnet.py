"""Seed-depth head: training smoke + estimator interface.

The in-process replacement for the reference's torch.hub ZoeDepth seed
depth (/root/reference/dataset_io.py:189-234, ace_zero.py:170-173)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acezero_tpu.models.depthnet import (
    depth_head_apply,
    init_depth_head_params,
    silog_loss,
)


def test_depth_head_shapes_positive():
    params = init_depth_head_params(jax.random.PRNGKey(0))
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 16, 512), jnp.float32)
    d = depth_head_apply(params, feats)
    assert d.shape == (2, 12, 16)
    assert (np.asarray(d) > 0).all()


def test_silog_scale_invariance():
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.uniform(1.0, 5.0, (4, 12, 16)), jnp.float32)
    pred = gt * 1.7  # uniformly wrong scale
    valid = jnp.ones_like(gt, bool)
    full = float(silog_loss(pred, gt, valid, lam=1.0))
    assert full < 1e-6  # lam=1: pure scale error vanishes
    anchored = float(silog_loss(pred, gt, valid, lam=0.85))
    assert anchored > 0.01  # lam<1 keeps a metric anchor


@pytest.mark.slow
def test_depth_pretrain_smoke(tmp_path):
    from acezero_tpu.models.encoder import init_encoder_params
    from acezero_tpu.models.torch_io import save_encoder
    from acezero_tpu.pretrain.depth_pretrain import (
        DepthPretrainConfig,
        pretrain_depth_head,
    )

    enc_path = tmp_path / "enc.pt"
    save_encoder(enc_path, jax.device_get(init_encoder_params(jax.random.PRNGKey(0))))

    cfg = DepthPretrainConfig(
        num_scenes=2,
        views_per_scene=4,
        image_h=96,
        image_w=128,
        steps=60,
        batch_images=4,
        chunk_steps=30,
    )
    out_path = tmp_path / "depth.pt"
    result = pretrain_depth_head(cfg, enc_path, out_path)
    assert out_path.exists()
    assert np.isfinite(result["final_loss"])

    # estimator interface: rgb (or gray) in, positive full-res depth out
    from acezero_tpu.data.depth import learned_depth_estimator

    est = learned_depth_estimator(out_path, encoder_path=enc_path)
    rgb = np.random.default_rng(0).integers(0, 255, (100, 130, 3), np.uint8)
    depth = est(rgb)
    assert depth.shape == (100, 130)
    assert (depth > 0).all()
