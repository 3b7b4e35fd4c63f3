"""Seed-depth head pretraining on the procedural corpus.

Trains `models.depthnet` (a small conv head on the frozen pretrained ACE
encoder) to predict stride-8 depth with the scale-invariant log loss —
the hermetic replacement for the reference's torch.hub ZoeDepth seed depth
(/root/reference/dataset_io.py:189-234). One pass, minutes on a chip: the
encoder is frozen, so each image's features are computed once per epoch and
only the ~1.5M-param head trains.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from acezero_tpu.data.images import GRAY_MEAN, GRAY_STD
from acezero_tpu.data.synthetic import render_scene
from acezero_tpu.models.depthnet import (
    depth_head_apply,
    gradient_matching_loss,
    init_depth_head_params,
    silog_loss,
)
from acezero_tpu.models.encoder import encoder_apply
from acezero_tpu.models.torch_io import load_encoder, save_encoder
from acezero_tpu.training.optim import adamw_init, adamw_update

_logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class DepthPretrainConfig:
    num_scenes: int = 64
    views_per_scene: int = 16
    image_h: int = 240
    image_w: int = 320
    steps: int = 8000
    batch_images: int = 32
    learning_rate: float = 1e-3
    warmup_steps: int = 100
    silog_lambda: float = 0.85
    grad_loss_weight: float = 0.5
    low_texture_frac: float = 0.2
    photometric: bool = True
    seed: int = 97
    chunk_steps: int = 100
    # Corpus preset: "v4" reproduces the SHIPPED default head's corpus
    # (single-octave textures, across/outward ring looks only — the exact
    # draw sequence of the round-3 recipe at sha f4f7f9e, kept so
    # weights/tpu_depth_v4.pt stays reproducible from HEAD); "v5" is the
    # octave/look-mixture corpus (tested round 4 and REFUTED as a fix for
    # the ring collapse — shape error unchanged; kept for reproducibility
    # of that negative result). Mixture knobs below apply to v5 only.
    corpus: str = "v5"
    width_mult: int = 1  # depth-head hidden-width multiplier (capacity probe)
    texture_octaves_probs: tuple = ((1, 0.2), (2, 0.2), (3, 0.6))
    look_probs: tuple = (("sweep", 0.3), ("across", 0.35), ("outward", 0.35))


def _draw(rng, choices_probs):
    vals = [v for v, _ in choices_probs]
    probs = np.array([p for _, p in choices_probs], np.float64)
    return vals[int(rng.choice(len(vals), p=probs / probs.sum()))]


def build_depth_corpus(cfg: DepthPretrainConfig):
    images, depths = [], []
    corpus_rng = np.random.default_rng(cfg.seed)
    for s in range(cfg.num_scenes):
        strength = 1.0
        if corpus_rng.random() < cfg.low_texture_frac:
            strength = float(corpus_rng.uniform(0.3, 0.6))
        if cfg.corpus == "v4":
            # the shipped head's corpus, draw-for-draw (see DepthPretrainConfig)
            look = "across" if corpus_rng.random() < 0.4 else "outward"
            octaves = 1
        else:
            look = _draw(corpus_rng, cfg.look_probs)
            octaves = _draw(corpus_rng, cfg.texture_octaves_probs)
        scene = render_scene(
            cfg.views_per_scene,
            h=cfg.image_h,
            w=cfg.image_w,
            seed=cfg.seed + 1000 + s,
            texture_strength=strength,
            photometric=cfg.photometric,
            look=look,
            texture_octaves=octaves,
        )
        images.append(scene.images_u8)
        depths.append(scene.depth)
    images = np.concatenate(images)  # (N, h, w) u8
    depths = np.concatenate(depths).astype(np.float32)
    # stride-8 GT at the cell centers (the head's output resolution)
    d8 = depths[:, 4::8, 4::8]
    return images, d8


@partial(jax.jit, static_argnames=("lam", "grad_w"), donate_argnames=("params", "opt"))
def _train_chunk(params, opt, encoder_params, images_u8, gt_d8, order, lr_tab, lam, grad_w):
    """A scan of training steps over pre-drawn batch indices."""

    def step(carry, inputs):
        params, opt = carry
        idx, lr = inputs
        imgs = images_u8[idx].astype(jnp.float32) / 255.0
        x = ((imgs - GRAY_MEAN) / GRAY_STD)[..., None]
        feats = jax.lax.stop_gradient(encoder_apply(encoder_params, x))
        gt = gt_d8[idx]

        def loss_fn(p):
            pred = depth_head_apply(p, feats)
            valid = gt > 0
            return silog_loss(pred, gt, valid, lam=lam) + grad_w * gradient_matching_loss(
                pred, gt, valid
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt = adamw_update(params, grads, opt, lr, weight_decay=1e-4)
        return (params, opt), loss

    (params, opt), losses = jax.lax.scan(step, (params, opt), (order, lr_tab))
    return params, opt, losses


def pretrain_depth_head(
    cfg: DepthPretrainConfig,
    encoder_path: str | Path,
    out_path: str | Path,
) -> dict:
    t0 = time.time()
    encoder_params = jax.tree.map(jnp.asarray, load_encoder(encoder_path))
    images, gt_d8 = build_depth_corpus(cfg)
    n = len(images)
    _logger.info("Depth corpus: %d images (%d scenes).", n, cfg.num_scenes)

    key = jax.random.PRNGKey(cfg.seed)
    key, k_init = jax.random.split(key)
    params = init_depth_head_params(k_init, width_mult=cfg.width_mult)
    opt = adamw_init(params)

    images_dev = jnp.asarray(images)
    gt_dev = jnp.asarray(gt_d8)

    rng = np.random.default_rng(cfg.seed)
    lr_full = np.full(cfg.steps, cfg.learning_rate, np.float32)
    warm = min(cfg.warmup_steps, cfg.steps)
    lr_full[:warm] *= np.linspace(0.02, 1.0, warm)
    # cosine decay after warmup
    tail = np.arange(cfg.steps - warm)
    lr_full[warm:] *= 0.5 * (1.0 + np.cos(np.pi * tail / max(1, len(tail))))

    done = 0
    last_losses = None
    while done < cfg.steps:
        m = min(cfg.chunk_steps, cfg.steps - done)
        order = rng.integers(0, n, (m, cfg.batch_images))
        params, opt, losses = _train_chunk(
            params,
            opt,
            encoder_params,
            images_dev,
            gt_dev,
            jnp.asarray(order, jnp.int32),
            jnp.asarray(lr_full[done : done + m]),
            cfg.silog_lambda,
            cfg.grad_loss_weight,
        )
        last_losses = np.asarray(losses)
        done += m
        _logger.info("depth pretrain %d/%d: loss %.4f", done, cfg.steps, last_losses.mean())

    save_encoder(out_path, jax.device_get(params))
    _logger.info(
        "Saved depth head to %s (%.1f min).", out_path, (time.time() - t0) / 60
    )
    return {"params": params, "final_loss": float(last_losses.mean())}
