"""Golden tests for the sub-pixel photometric match refinement.

Ground truth from the procedural room scene: a source cell center's true
position in a target view follows from GT depth + poses. The matcher's
output is simulated by perturbing the truth by a few pixels; refinement
must pull it back to sub-pixel accuracy (the property that makes ring
bends observable to the track BA — round-3 analysis)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from synthetic import render_room_scene

from acezero_tpu.data.depth import seed_scene_coordinates
from acezero_tpu.reconstruct.subpix import (
    SubpixConfig,
    refine_matches_photometric,
)

H, W = 192, 256
SUB = 8


@pytest.fixture(scope="module")
def stereo():
    data = render_room_scene(10, h=H, w=W, focal=220.0, seed=6, spread=0.35)
    n = 10
    maps = np.stack(
        [
            seed_scene_coordinates(data["depth"][i], data["focal"], data["poses_c2w"][i])
            for i in range(n)
        ]
    )
    valid = np.abs(maps).sum(-1) > 1e-6
    w2c = np.linalg.inv(data["poses_c2w"]).astype(np.float64)
    return data, maps, valid, w2c


def _true_projection(maps, w2c, focal, src, tgt, u_src):
    """GT target-pixel positions of source cell centers via the GT sheet."""
    gi = ((u_src[:, 1] - SUB / 2) / SUB).astype(int)
    gj = ((u_src[:, 0] - SUB / 2) / SUB).astype(int)
    Xw = maps[src][gi, gj]
    pc = Xw @ w2c[tgt][:3, :3].T + w2c[tgt][:3, 3]
    z = pc[:, 2]
    u = focal * pc[:, 0] / z + W / 2.0
    v = focal * pc[:, 1] / z + H / 2.0
    return np.stack([u, v], -1), z > 0.1


def test_refinement_recovers_subpixel_truth(stereo):
    data, maps, valid, w2c = stereo
    focal = data["focal"]
    rng = np.random.default_rng(4)

    h, w = H // SUB, W // SUB
    ii = (np.arange(2, h - 2)) * SUB + SUB / 2.0
    jj = (np.arange(2, w - 2)) * SUB + SUB / 2.0
    u_src = np.stack([np.tile(jj, len(ii)), np.repeat(ii, len(jj))], -1).astype(
        np.float32
    )
    P = len(u_src)

    pairs = np.asarray([[0, 1], [4, 5], [8, 9]])
    E = len(pairs)
    u_true = np.zeros((E, P, 2), np.float32)
    ok = np.zeros((E, P), bool)
    for e, (s, t) in enumerate(pairs):
        ut, inb = _true_projection(maps, w2c, focal, s, t, u_src)
        u_true[e] = ut
        gi = ((u_src[:, 1] - SUB / 2) / SUB).astype(int)
        gj = ((u_src[:, 0] - SUB / 2) / SUB).astype(int)
        ok[e] = (
            inb
            & valid[s][gi, gj]
            & (ut[:, 0] > 8) & (ut[:, 0] < W - 8)
            & (ut[:, 1] > 8) & (ut[:, 1] < H - 8)
        )
    assert ok.sum() > 300

    # simulated matcher output: truth + 1-3 px error
    noise = rng.uniform(-3.0, 3.0, (E, P, 2)).astype(np.float32)
    u_match = u_true + noise
    err_in = np.linalg.norm((u_match - u_true)[ok], axis=-1)

    u_ref, ok_ref, diag = refine_matches_photometric(
        data["images_u8"],
        maps,
        valid,
        w2c,
        np.full(10, focal, np.float32),
        (H, W),
        pairs,
        u_src,
        u_match,
        ok,
        SubpixConfig(max_matches_per_pair=256),
    )
    assert diag["n_accepted"] > 0.5 * diag["n_selected"], diag
    err_out = np.linalg.norm((u_ref - u_true)[ok_ref], axis=-1)
    # the acceptance-filtered refined error must be sub-pixel, and a large
    # improvement over the simulated matcher noise
    assert np.median(err_out) < 0.3, (
        f"median refined error {np.median(err_out):.3f} px vs input "
        f"{np.median(err_in):.3f} px; diag {diag}"
    )
    assert np.percentile(err_out, 90) < 1.0


def test_refinement_rejects_bad_matches(stereo):
    """Matches pointing at the wrong place (beyond the pull-in range) must
    be rejected rather than accepted at a wrong position."""
    data, maps, valid, w2c = stereo
    focal = data["focal"]
    rng = np.random.default_rng(5)

    h, w = H // SUB, W // SUB
    ii = (np.arange(3, h - 3, 2)) * SUB + SUB / 2.0
    jj = (np.arange(3, w - 3, 2)) * SUB + SUB / 2.0
    u_src = np.stack([np.tile(jj, len(ii)), np.repeat(ii, len(jj))], -1).astype(
        np.float32
    )
    P = len(u_src)
    pairs = np.asarray([[0, 1]])
    u_true, inb = _true_projection(maps, w2c, focal, 0, 1, u_src)
    gi = ((u_src[:, 1] - SUB / 2) / SUB).astype(int)
    gj = ((u_src[:, 0] - SUB / 2) / SUB).astype(int)
    ok = (
        inb & valid[0][gi, gj]
        & (u_true[:, 0] > 8) & (u_true[:, 0] < W - 8)
        & (u_true[:, 1] > 8) & (u_true[:, 1] < H - 8)
    )[None]

    # gross outliers: 25-40 px away — far outside max_shift_px
    direction = rng.normal(size=(1, P, 2))
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)
    u_match = (u_true[None] + direction * rng.uniform(25, 40, (1, P, 1))).astype(
        np.float32
    )

    u_ref, ok_ref, diag = refine_matches_photometric(
        data["images_u8"], maps, valid, w2c,
        np.full(10, focal, np.float32), (H, W),
        pairs, u_src, u_match, ok,
        SubpixConfig(max_matches_per_pair=128),
    )
    # whatever is accepted must be accurate; gross outliers cannot sneak in
    if ok_ref.any():
        err = np.linalg.norm((u_ref - u_true[None])[ok_ref], axis=-1)
        assert np.median(err) < 1.0 or ok_ref.sum() < 0.1 * ok.sum()
    assert diag["accept_rate"] < 0.5, diag
