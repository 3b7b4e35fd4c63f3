import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acezero_tpu.models import (
    HeadConfig,
    Regressor,
    encoder_apply,
    head_apply_flat,
    init_encoder_params,
    init_head_params,
    init_posenet_params,
    posenet_apply,
    torch_io,
)


def test_encoder_output_shape():
    params = init_encoder_params(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 64, 96, 1), jnp.float32)
    feats = encoder_apply(params, x)
    assert feats.shape == (2, 8, 12, 512)


def test_encoder_stride8_odd_sizes():
    # torch Conv2d(k3 s2 p1) gives ceil(H/2) per stage; check a non-multiple-of-8 size
    params = init_encoder_params(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 60, 81, 1), jnp.float32)
    feats = encoder_apply(params, x)
    assert feats.shape == (1, 8, 11, 512)  # ceil(60/8)=8, ceil(81/8)=11


def test_head_output_shape_and_mean():
    cfg = HeadConfig()
    mean = jnp.asarray([10.0, -5.0, 3.0])
    params = init_head_params(jax.random.PRNGKey(1), cfg, mean)
    feats = jnp.zeros((32, 512), jnp.float32)
    out = head_apply_flat(params, cfg, feats)
    assert out.shape == (32, 3)
    assert out.dtype == jnp.float32
    # zero features -> constant output; predictions should be near the mean
    # (bounded by max_scale dehomogenization of small random weights output)
    assert np.all(np.isfinite(np.asarray(out)))


def test_head_homogeneous_scale_bounds():
    # The homogeneous divisor h must lie in [1/max_scale, 1/min_scale]:
    # feed extreme fc3 outputs by scaling weights
    cfg = HeadConfig(homogeneous_min_scale=0.01, homogeneous_max_scale=4.0)
    mean = jnp.zeros(3)
    params = init_head_params(jax.random.PRNGKey(2), cfg, mean)
    # push fc3's 4th output very negative -> h clamps at max_inv... softplus
    # floor is max_inv_scale -> coordinate scale at most max_scale
    p = jax.tree.map(lambda x: x, params)
    p["fc3"]["b"] = p["fc3"]["b"].at[3].set(-100.0)
    feats = jax.random.normal(jax.random.PRNGKey(3), (16, 512))
    out_lo = head_apply_flat(p, cfg, feats)
    p["fc3"]["b"] = p["fc3"]["b"].at[3].set(+1000.0)
    out_hi = head_apply_flat(p, cfg, feats)
    raw = None  # scale checks: ratio between extremes bounded by max/min scale
    ratio = np.abs(np.asarray(out_lo)).mean() / max(np.abs(np.asarray(out_hi)).mean(), 1e-9)
    # divisor range is [0.25, 100] -> outputs differ by up to 400x
    assert 10.0 < ratio < 1000.0


def test_posenet_shapes():
    params = init_posenet_params(jax.random.PRNGKey(4))
    poses = jax.random.normal(jax.random.PRNGKey(5), (7, 12))
    delta = posenet_apply(params, poses)
    assert delta.shape == (7, 12)


def test_head_torch_roundtrip(tmp_path):
    cfg = HeadConfig(num_head_blocks=2)
    mean = jnp.asarray([1.0, 2.0, 3.0])
    params = init_head_params(jax.random.PRNGKey(6), cfg, mean)
    path = tmp_path / "head.pt"
    torch_io.save_head(path, jax.device_get(params), cfg, half=False)
    cfg2, params2 = torch_io.load_head(path)
    assert cfg2.num_head_blocks == 2
    assert cfg2.use_homogeneous
    assert cfg2.in_channels == 512
    feats = jax.random.normal(jax.random.PRNGKey(7), (8, 512))
    out1 = head_apply_flat(params, cfg, feats)
    out2 = head_apply_flat(jax.tree.map(jnp.asarray, params2), cfg2, feats)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_encoder_torch_roundtrip(tmp_path):
    params = init_encoder_params(jax.random.PRNGKey(8))
    path = tmp_path / "encoder.pt"
    torch_io.save_encoder(path, jax.device_get(params))
    params2 = torch_io.load_encoder(path)
    x = jax.random.normal(jax.random.PRNGKey(9), (1, 32, 32, 1))
    out1 = encoder_apply(params, x)
    out2 = encoder_apply(jax.tree.map(jnp.asarray, params2), x)
    np.testing.assert_allclose(
        np.asarray(out1, np.float32), np.asarray(out2, np.float32), atol=1e-3
    )


def test_head_matches_torch_reference_semantics():
    """Cross-check our head against an independent torch implementation of the
    published ACE head architecture (1x1 convs, softplus homogeneous output)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    cfg = HeadConfig(num_head_blocks=1)
    mean = jnp.asarray([0.5, -0.5, 2.0])
    params = init_head_params(jax.random.PRNGKey(10), cfg, mean)
    np_params = jax.device_get(params)

    feats = np.random.default_rng(0).normal(size=(64, 512)).astype(np.float32)

    def t_dense(x, p):
        w = torch.from_numpy(np.asarray(p["w"], np.float32))
        b = torch.from_numpy(np.asarray(p["b"], np.float32))
        return x @ w + b

    x = torch.from_numpy(feats)
    h = F.relu(t_dense(x, np_params["res3_conv1"]))
    h = F.relu(t_dense(h, np_params["res3_conv2"]))
    h = F.relu(t_dense(h, np_params["res3_conv3"]))
    res = x + h
    for block in np_params["blocks"]:
        h = F.relu(t_dense(res, block["c0"]))
        h = F.relu(t_dense(h, block["c1"]))
        h = F.relu(t_dense(h, block["c2"]))
        res = res + h
    sc = F.relu(t_dense(res, np_params["fc1"]))
    sc = F.relu(t_dense(sc, np_params["fc2"]))
    sc = t_dense(sc, np_params["fc3"])

    max_inv_scale = 1.0 / cfg.homogeneous_max_scale
    h_beta = math.log(2.0) / (1.0 - max_inv_scale)
    hs = F.softplus(sc[:, 3:4], beta=h_beta) + max_inv_scale
    hs = hs.clamp(max=1.0 / cfg.homogeneous_min_scale)
    expected = (sc[:, :3] / hs).numpy() + np.asarray(mean)

    got = np.asarray(head_apply_flat(params, cfg, jnp.asarray(feats), compute_dtype=jnp.float32))
    np.testing.assert_allclose(got, expected, atol=2e-4)


def test_regressor_forward_and_refresh():
    reg = Regressor.create_new(jax.random.PRNGKey(11), jnp.zeros(3))
    imgs = jax.random.normal(jax.random.PRNGKey(12), (1, 48, 64, 1))
    coords = reg.forward(imgs)
    assert coords.shape == (1, 6, 8, 3)
    reg2 = reg.with_new_head(jax.random.PRNGKey(13), jnp.ones(3))
    coords2 = reg2.forward(imgs)
    assert not np.allclose(np.asarray(coords), np.asarray(coords2))


def test_encoder_matches_torch_reference_semantics(tmp_path):
    """Import path for the REFERENCE encoder blob: build the published ACE
    encoder as a torch module (layer names, kernel sizes, strides, and the
    res2 skip exactly as /root/reference/ace_network.py:14-59), forward a
    random image in torch, then import its state dict through
    torch_io.load_encoder and assert our encoder_apply reproduces the torch
    features. This is what `--encoder_path ace_encoder_pretrained.pt`
    relies on."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn
    import torch.nn.functional as F

    class RefEncoder(nn.Module):
        def __init__(self, out_channels=512):
            super().__init__()
            self.conv1 = nn.Conv2d(1, 32, 3, 1, 1)
            self.conv2 = nn.Conv2d(32, 64, 3, 2, 1)
            self.conv3 = nn.Conv2d(64, 128, 3, 2, 1)
            self.conv4 = nn.Conv2d(128, 256, 3, 2, 1)
            self.res1_conv1 = nn.Conv2d(256, 256, 3, 1, 1)
            self.res1_conv2 = nn.Conv2d(256, 256, 1, 1, 0)
            self.res1_conv3 = nn.Conv2d(256, 256, 3, 1, 1)
            self.res2_conv1 = nn.Conv2d(256, 512, 3, 1, 1)
            self.res2_conv2 = nn.Conv2d(512, 512, 1, 1, 0)
            self.res2_conv3 = nn.Conv2d(512, out_channels, 3, 1, 1)
            self.res2_skip = nn.Conv2d(256, out_channels, 1, 1, 0)

        def forward(self, x):
            x = F.relu(self.conv1(x))
            x = F.relu(self.conv2(x))
            x = F.relu(self.conv3(x))
            res = F.relu(self.conv4(x))
            x = F.relu(self.res1_conv1(res))
            x = F.relu(self.res1_conv2(x))
            x = F.relu(self.res1_conv3(x))
            res = res + x
            x = F.relu(self.res2_conv1(res))
            x = F.relu(self.res2_conv2(x))
            x = F.relu(self.res2_conv3(x))
            return self.res2_skip(res) + x

    torch.manual_seed(5)
    ref = RefEncoder().eval()
    img = torch.randn(1, 1, 48, 64)
    with torch.no_grad():
        want = ref(img).numpy()[0].transpose(1, 2, 0)  # HWC

    blob = tmp_path / "ace_encoder_pretrained.pt"
    torch.save(ref.state_dict(), blob)
    params = jax.tree.map(jnp.asarray, torch_io.load_encoder(blob))
    got = np.asarray(
        encoder_apply(params, jnp.asarray(img.numpy().transpose(0, 2, 3, 1)))[0],
        np.float32,
    )
    assert got.shape == want.shape == (6, 8, 512)
    np.testing.assert_allclose(got, want, atol=2e-3)
