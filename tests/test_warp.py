"""Gather-free affine warp: geometric exactness and filter behavior.

The warp (data/warp.py) implements out(p) = img(R(-theta)/s (p-c) + c) as
two-pass Catmull-Smith resampling (per-image resize matmuls + barrel-shift
shears). These tests pin its geometry against the closed-form map and the
reference map_coordinates warp it replaced.
"""

import jax
import jax.numpy as jnp
import numpy as np

from acezero_tpu.data.augment import _affine_sample, _inverse_affine
from acezero_tpu.data.warp import affine_warp_batch

H, W = 96, 128


def _smooth_image(rng):
    small = rng.normal(size=(12, 16))
    return np.asarray(jax.image.resize(jnp.asarray(small), (H, W), "cubic"), np.float32)


def test_identity_is_exact(rng):
    img = _smooth_image(rng)
    out = affine_warp_batch(
        jnp.asarray(img)[None], jnp.zeros(1), jnp.ones(1), 15.0, 1.5
    )
    np.testing.assert_allclose(np.asarray(out[0]), img, atol=1e-5)


def test_linear_ramp_geometry_exact():
    """Normalized triangle filters have linear precision: a warped linear
    ramp must equal the analytically warped ramp in the interior (up to the
    discrete antialias filter's ~0.1px first-moment error)."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    Xc, Yc = xx + 0.5, yy + 0.5
    ramp = 0.013 * Xc + 0.007 * Yc + 0.3
    cx, cy = W / 2.0, H / 2.0

    thetas = np.array([0.2, -0.26, 0.1, -0.05, 0.25], np.float32)
    scales = np.array([0.8, 1.4, 0.67, 1.5, 1.0], np.float32)
    B = len(thetas)
    out = np.asarray(
        affine_warp_batch(
            jnp.tile(jnp.asarray(ramp)[None], (B, 1, 1)),
            jnp.asarray(thetas),
            jnp.asarray(scales),
            15.0,
            1.5,
        )
    )
    for b in range(B):
        th, s = thetas[b], scales[b]
        A = np.array(
            [[np.cos(th) / s, np.sin(th) / s], [-np.sin(th) / s, np.cos(th) / s]]
        )
        src = np.stack([Xc - cx, Yc - cy], -1) @ A.T + np.array([cx, cy])
        expected = 0.013 * src[..., 0] + 0.007 * src[..., 1] + 0.3
        inside = (
            (src[..., 0] > 4) & (src[..., 0] < W - 4)
            & (src[..., 1] > 4) & (src[..., 1] < H - 4)
        )
        d = np.abs(out[b] - expected)[inside]
        assert d.max() < 4e-3, (b, d.max())
        assert d.mean() < 1e-3


def test_matches_map_coordinates_on_smooth_images(rng):
    """Against the reference gather warp: small differences from the extra
    interpolation pass + antialias on minification, no geometric error."""
    img = _smooth_image(rng)
    thetas = np.array([0.2, -0.26, 0.1], np.float32)
    scales = np.array([1.0, 1.3, 1.45], np.float32)  # s >= 1: bilinear regime
    B = len(thetas)
    out = np.asarray(
        affine_warp_batch(
            jnp.tile(jnp.asarray(img)[None], (B, 1, 1)),
            jnp.asarray(thetas),
            jnp.asarray(scales),
            15.0,
            1.5,
        )
    )
    center = jnp.array([W / 2.0, H / 2.0], jnp.float32)
    for b in range(B):
        A, bb = _inverse_affine(jnp.asarray(thetas[b]), jnp.asarray(scales[b]), center)
        ref = np.asarray(_affine_sample(jnp.asarray(img), A, bb, order=1))
        m = 10
        d = np.abs(out[b, m:-m, m:-m] - ref[m:-m, m:-m])
        assert d.max() < 0.12, (b, d.max())
        assert d.mean() < 0.012, (b, d.mean())
