"""Contrastive pretraining path (pretrain/encoder_pretrain.py).

Pins (1) that the pair-sampling + InfoNCE path runs and produces positives
on overlapping views, and (2) that the per-row head gradient clip isolates
rows (one huge row cannot shrink another's update).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acezero_tpu.training.optim import clip_global_norm, clip_per_row_norm


def test_clip_per_row_isolates_rows():
    g = {"w": jnp.stack([jnp.ones((4,)) * 1e6, jnp.ones((4,)) * 0.1])}
    clipped, norms = clip_per_row_norm(g, 1.0)
    # row 0 clipped to unit norm, row 1 untouched
    assert np.linalg.norm(np.asarray(clipped["w"][0])) == pytest.approx(1.0, rel=1e-5)
    assert np.allclose(np.asarray(clipped["w"][1]), 0.1)
    assert np.asarray(norms).shape == (2,)


def test_clip_global_norm_scales():
    g = {"a": jnp.ones((3,)) * 3.0, "b": jnp.ones((4,)) * 4.0}
    clipped, norm = clip_global_norm(g, 1.0)
    total = np.sqrt(
        np.sum(np.asarray(clipped["a"]) ** 2) + np.sum(np.asarray(clipped["b"]) ** 2)
    )
    assert total == pytest.approx(1.0, rel=1e-5)


@pytest.mark.slow
def test_contrastive_pretrain_runs_and_finds_positives():
    from acezero_tpu.pretrain.encoder_pretrain import (
        PretrainConfig,
        build_corpus,
        pretrain_encoder,
    )

    cfg = PretrainConfig(
        num_scenes=2,
        views_per_scene=12,
        image_h=96,
        image_w=128,
        steps=4,
        batch_images=4,
        chunk_steps=2,
        contrastive_weight=0.5,
        across_frac=1.0,  # convergent views overlap strongly
        use_aug=False,
    )
    res = pretrain_encoder(cfg, corpus=build_corpus(cfg))
    contrasts = [h["contrast"] for h in res["history"]]
    # with overlapping convergent views the InfoNCE must see positives:
    # random features over ~192 cells give loss near log(192) ~ 5.3
    assert any(c > 0.5 for c in contrasts), contrasts
    assert all(np.isfinite(h["loss"]) for h in res["history"])
