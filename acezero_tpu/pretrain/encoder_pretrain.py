"""TPU-native encoder pretraining: multi-scene scene-coordinate regression.

The reference ships `ace_encoder_pretrained.pt`, a convolutional backbone
trained once over ~100 real scenes with the ACE objective (ACE paper,
arXiv 2305.14059; the blob itself is absent from the mounted reference —
`.MISSING_LARGE_BLOBS`). This module reproduces that recipe end-to-end on
TPU so the framework is self-sufficient:

  - corpus: procedurally generated multi-view rooms
    (acezero_tpu.data.synthetic) with exact GT scene coordinates — or any
    real scenes with poses+depth via the same interface;
  - model: the shared encoder plus one scene head per corpus scene, trained
    jointly; heads are stacked into one (S, ...) pytree and applied via
    vmap-style gather so every step is a single fused program;
  - loss: masked L2 to GT scene coordinates plus the tanh reprojection
    loss — direct supervision (we have exact GT) instead of the reference's
    self-supervised bootstrap, which converges much faster;
  - the result exports through torch_io to a reference-compatible encoder
    state dict.

Scaling note: batch dim shards over the `data` mesh axis like the mapping
trainer; heads are replicated (a few M params each).
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from acezero_tpu.data.augment import augment_batch
from acezero_tpu.data.synthetic import render_scene, scene_coordinate_maps
from acezero_tpu.models.encoder import encoder_apply, init_encoder_params
from acezero_tpu.models.head import HeadConfig, head_apply_image, init_head_params
from acezero_tpu.models.torch_io import save_encoder
from acezero_tpu.training.optim import adamw_init, adamw_update

_logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class PretrainConfig:
    num_scenes: int = 8
    views_per_scene: int = 24
    image_h: int = 192
    image_w: int = 256
    steps: int = 4000
    batch_images: int = 8
    learning_rate: float = 0.002  # head learning rate
    encoder_lr_scale: float = 0.1  # encoder trains slower than the heads
    encoder_weight_decay: float = 0.0  # decay on a dying-ReLU path kills channels
    warmup_steps: int = 200
    head_blocks: int = 0
    coord_loss_weight: float = 1.0
    repro_loss_weight: float = 0.02
    repro_soft_clamp: float = 25.0
    use_aug: bool = True
    seed: int = 42
    chunk_steps: int = 100
    # corpus-hardness knobs (encoder v3): fraction of texture-poor scenes,
    # photometric nuisances (exposure/vignette/noise), camera-pattern mix
    low_texture_frac: float = 0.0
    photometric: bool = False
    across_frac: float = 0.0
    # corpus-diversity knobs (encoder v4): per-scene focal range (xW),
    # multi-octave texture mix, and exact analytic supervision (ray-cast GT
    # for the augmented camera instead of order-0 warping of the stride-8
    # map, which costs ~3 px median supervision misalignment)
    focal_min: float = 0.7
    focal_max: float = 1.4
    texture_octaves_max: int = 1
    exact_supervision: bool = True
    max_occ_boxes: int = 4
    # correspondence-contrastive loss (encoder v5): batches become same-scene
    # view PAIRS; cross-view cells whose exact GT points coincide (< tau_pos)
    # are positives in a symmetric InfoNCE over cosine feature similarity.
    # This optimizes cross-view feature matching *directly* — the property
    # scene-coordinate fitting actually needs — instead of hoping it emerges
    # from per-view regression (measured: regression-only runs land anywhere
    # between 27% and 57% match@10cm on held-out scenes; see round-2 notes).
    contrastive_weight: float = 0.0
    contrastive_tau_pos: float = 0.075  # meters; ~2 stride-8 cells at 2.5 m
    contrastive_temp: float = 0.1
    grad_clip_norm: float = 10.0  # 0 disables; heads clip per scene
    # corpus viewpoint diversity (encoder v7): fraction of views tilted
    # steeply toward floor/ceiling (grazing-surface appearance), and
    # fraction of contrastive pairs drawn at arbitrary ring separation
    # (wide-baseline viewpoint-invariance pressure; nearby pairs remain the
    # bulk so positives stay dense)
    pitch_frac: float = 0.0
    far_pair_frac: float = 0.0


def _render_corpus_scene(views: int, kwargs: dict):
    return render_scene(views, **kwargs)


def build_corpus(cfg: PretrainConfig):
    """Render the synthetic corpus: images, GT coord maps, poses, focals."""
    from acezero_tpu.data.scene_raycast import pad_occ_boxes

    images, coords, w2c, c2w, focals, scene_ids = [], [], [], [], [], []
    box_halves, occ_lists = [], []
    corpus_rng = np.random.default_rng(cfg.seed)
    # draw per-scene params sequentially (stable stream), render in parallel
    scene_kwargs = []
    for s in range(cfg.num_scenes):
        strength = 1.0
        if corpus_rng.random() < cfg.low_texture_frac:
            strength = float(corpus_rng.uniform(0.25, 0.6))
        look = "across" if corpus_rng.random() < cfg.across_frac else "outward"
        focal = float(corpus_rng.uniform(cfg.focal_min, cfg.focal_max) * cfg.image_w)
        octaves = int(corpus_rng.integers(1, cfg.texture_octaves_max + 1))
        scene_kwargs.append(
            dict(
                h=cfg.image_h,
                w=cfg.image_w,
                seed=cfg.seed + s,
                focal=focal,
                texture_strength=strength,
                photometric=cfg.photometric,
                look=look,
                texture_octaves=octaves,
                pitch_frac=cfg.pitch_frac,
            )
        )

    import multiprocessing as mp
    from concurrent.futures import ProcessPoolExecutor

    workers = min(cfg.num_scenes, max(1, (mp.cpu_count() or 2) - 1))
    with ProcessPoolExecutor(max_workers=workers) as pool:
        scenes = list(
            pool.map(
                partial(_render_corpus_scene, cfg.views_per_scene), scene_kwargs
            )
        )
    for s, scene in enumerate(scenes):
        images.append(scene.images_u8)
        coords.append(scene_coordinate_maps(scene))
        w2c.append(np.linalg.inv(scene.poses_c2w.astype(np.float64)).astype(np.float32))
        c2w.append(scene.poses_c2w.astype(np.float32))
        focals.append(np.full(cfg.views_per_scene, scene.focal, np.float32))
        scene_ids.append(np.full(cfg.views_per_scene, s, np.int32))
        box_halves.append(np.full(cfg.views_per_scene, scene.box_half, np.float32))
        occ_lists.append(scene.occ_boxes)
    occ_padded = pad_occ_boxes(occ_lists, cfg.max_occ_boxes)  # (S, K, 2, 3)
    ids = np.concatenate(scene_ids)
    return {
        "images_u8": np.concatenate(images),
        "coords": np.concatenate(coords).astype(np.float32),
        "w2c": np.concatenate(w2c),
        "c2w": np.concatenate(c2w),
        "focals": np.concatenate(focals),
        "scene_ids": ids,
        "box_half": np.concatenate(box_halves),
        "occ_boxes": occ_padded[ids],  # (N_views, K, 2, 3)
    }


def _stack_heads(keys, head_cfg: HeadConfig, means: jax.Array):
    params = [init_head_params(k, head_cfg, m) for k, m in zip(keys, means)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params)


def _lr_at(cfg: PretrainConfig, step: jax.Array) -> jax.Array:
    warm = jnp.clip(step / max(cfg.warmup_steps, 1), 0.0, 1.0)
    t = jnp.clip((step - cfg.warmup_steps) / max(cfg.steps - cfg.warmup_steps, 1), 0.0, 1.0)
    cos = 0.5 * (1.0 + jnp.cos(jnp.pi * t))
    return cfg.learning_rate * warm * (0.05 + 0.95 * cos)


@partial(jax.jit, static_argnames=("cfg", "head_cfg"))
def _pretrain_chunk(params, opt_state, data, key, step0, cfg: PretrainConfig, head_cfg: HeadConfig):
    n_total = data["images_u8"].shape[0]
    sub = 8

    def loss_fn(p, batch_idx, k_aug):
        imgs = data["images_u8"][batch_idx]
        sizes = jnp.tile(
            jnp.asarray([[cfg.image_h, cfg.image_w]], jnp.int32), (cfg.batch_images, 1)
        )
        aug = augment_batch(
            k_aug, imgs, sizes, aug_rotation_deg=15.0,
            aug_scale_min=2.0 / 3.0, aug_scale_max=1.5, enabled=cfg.use_aug,
        )
        feats = encoder_apply(p["encoder"], aug["images"])
        heads_b = jax.tree.map(lambda x: x[data["scene_ids"][batch_idx]], p["heads"])
        coords_pred = jax.vmap(
            lambda hp, f: head_apply_image(hp, head_cfg, f[None])[0]
        )(heads_b, feats)  # (B, hs, ws, 3)

        off = sub // 2
        if cfg.exact_supervision:
            # exact GT: ray-cast the scene at the augmented virtual camera
            # (w2c' = Rz(theta) @ w2c, f' = s * f) — zero warp error
            from acezero_tpu.data.scene_raycast import render_coord_grid_batch

            ca, sa = jnp.cos(-aug["thetas"]), jnp.sin(-aug["thetas"])
            zeros4 = jnp.zeros_like(ca)
            ones4 = jnp.ones_like(ca)
            Rz_inv = jnp.stack(
                [ca, -sa, zeros4, zeros4,
                 sa, ca, zeros4, zeros4,
                 zeros4, zeros4, ones4, zeros4,
                 zeros4, zeros4, zeros4, ones4], -1
            ).reshape(-1, 4, 4)
            c2w_aug = jnp.einsum("bij,bjk->bik", data["c2w"][batch_idx], Rz_inv)
            hs_g, ws_g = cfg.image_h // sub, cfg.image_w // sub
            gt = render_coord_grid_batch(
                data["box_half"][batch_idx],
                data["occ_boxes"][batch_idx],
                c2w_aug,
                data["focals"][batch_idx] * aug["scales"],
                jnp.float32(cfg.image_w / 2.0),
                jnp.float32(cfg.image_h / 2.0),
                hs_g,
                ws_g,
                sub,
            )
            mask = aug["masks"][:, off::sub, off::sub]
        else:
            # warp GT maps with the same augmentation (order-0, zeros invalid)
            from acezero_tpu.data.augment import warp_target_map

            gt = jax.vmap(warp_target_map)(
                data["coords"][batch_idx], aug["thetas"], aug["scales"]
            )
            mask = aug["masks"][:, off::sub, off::sub]
            mask = mask & (jnp.sum(jnp.abs(gt), axis=-1) > 1e-5)
        mask_f = mask.astype(jnp.float32)
        n_valid = jnp.maximum(jnp.sum(mask_f), 1.0)

        coord_l2 = jnp.sum(jnp.sum((coords_pred - gt) ** 2, axis=-1) * mask_f) / n_valid

        # reprojection through the augmented camera
        w2c = data["w2c"][batch_idx]  # (B, 4, 4) original
        c, s = jnp.cos(aug["thetas"]), jnp.sin(aug["thetas"])
        zeros = jnp.zeros_like(c)
        ones = jnp.ones_like(c)
        Rz = jnp.stack([c, -s, zeros, s, c, zeros, zeros, zeros, ones], -1).reshape(-1, 3, 3)
        R_eff = Rz @ w2c[:, :3, :3]
        t_eff = jnp.einsum("bij,bj->bi", Rz, w2c[:, :3, 3])
        p_cam = jnp.einsum("bij,bhwj->bhwi", R_eff, coords_pred) + t_eff[:, None, None, :]
        z = jnp.maximum(p_cam[..., 2], 0.1)
        f_aug = (data["focals"][batch_idx] * aug["scales"])[:, None, None]
        hs, ws = coords_pred.shape[1:3]
        gx = (jnp.arange(ws) + 0.5) * sub
        gy = (jnp.arange(hs) + 0.5) * sub
        u = f_aug * p_cam[..., 0] / z + cfg.image_w / 2.0
        v = f_aug * p_cam[..., 1] / z + cfg.image_h / 2.0
        err = jnp.abs(u - gx[None, None, :]) + jnp.abs(v - gy[None, :, None])
        w = cfg.repro_soft_clamp
        repro = jnp.sum(w * jnp.tanh(err / w) * mask_f) / n_valid

        loss = cfg.coord_loss_weight * coord_l2 + cfg.repro_loss_weight * repro

        contrast = jnp.float32(0.0)
        if cfg.contrastive_weight > 0.0:
            # per-cell positive radius: ~1.25 stride-8 cell spacings at the
            # cell's depth (8 * z / f'). A fixed metric tau starves the loss
            # of positives whenever cell spacing exceeds it (far walls, small
            # images, short focals) — measured as intermittent contrast=0
            # steps at 192x256 and total silence at 96x128.
            z_cam = (
                jnp.einsum("bij,bhwj->bhwi", w2c[:, :3, :3], gt)
                + w2c[:, :3, 3][:, None, None, :]
            )[..., 2]
            spacing = sub * jnp.maximum(z_cam, 0.1) / f_aug
            tau = jnp.maximum(1.25 * spacing, cfg.contrastive_tau_pos)
            contrast = _contrastive_loss(feats, gt, mask, tau, cfg)
            loss = loss + cfg.contrastive_weight * contrast
        return loss, (coord_l2, repro, contrast)

    def _contrastive_loss(feats, gt, mask, tau, cfg: PretrainConfig):
        """Symmetric InfoNCE over exact cross-view cell correspondences.

        feats: (B, hs, ws, C) with B = 2P same-scene pairs (2i, 2i+1);
        gt: (B, hs, ws, 3) exact coordinates; mask: (B, hs, ws) valid cells;
        tau: (B, hs, ws) per-cell positive radius in meters.
        """
        B = feats.shape[0]
        N = feats.shape[1] * feats.shape[2]
        f = feats.reshape(B, N, -1).astype(jnp.float32)
        f = f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-6)
        g = gt.reshape(B, N, 3)
        m = mask.reshape(B, N)
        fa, fb = f[0::2], f[1::2]  # (P, N, C)
        ga, gb = g[0::2], g[1::2]
        ma, mb = m[0::2], m[1::2]
        tau_a = tau.reshape(B, N)[0::2]

        d2 = jnp.sum((ga[:, :, None, :] - gb[:, None, :, :]) ** 2, axis=-1)
        # exclude invalid B cells from the nearest-point search
        d2 = jnp.where(mb[:, None, :], d2, jnp.inf)
        jstar = jnp.argmin(d2, axis=2)  # (P, N)
        dmin2 = jnp.min(d2, axis=2)
        pos_a = (dmin2 < tau_a**2) & ma  # (P, N)

        sim = jnp.einsum("pnc,pmc->pnm", fa, fb) / cfg.contrastive_temp
        sim = jnp.where(mb[:, None, :], sim, -jnp.inf)
        logp_ab = jax.nn.log_softmax(sim, axis=2)
        ce_ab = -jnp.take_along_axis(logp_ab, jstar[..., None], axis=2)[..., 0]

        sim_t = jnp.where(ma[:, :, None], sim, -jnp.inf)
        logp_ba = jax.nn.log_softmax(sim_t, axis=1)
        ce_ba = -jnp.take_along_axis(logp_ba, jstar[..., None], axis=2)[..., 0]

        w = pos_a.astype(jnp.float32)
        n_pos = jnp.maximum(jnp.sum(w), 1.0)
        return jnp.sum((ce_ab + ce_ba) * 0.5 * w) / n_pos

    V = cfg.views_per_scene

    def _sample_batch(k_batch):
        if cfg.contrastive_weight > 0.0:
            # same-scene NEARBY view pairs interleaved (2i, 2i+1): views sit
            # on a ring, so +-1..4 ring-neighbors guarantee visual overlap
            # (a random pair of outward-looking views usually shares nothing,
            # which starves the loss of positives)
            P = cfg.batch_images // 2
            k_s, k_v1, k_v2, k_sign, k_far, k_fsel = jax.random.split(k_batch, 6)
            scene_sel = jax.random.randint(k_s, (P,), 0, cfg.num_scenes)
            off1 = jax.random.randint(k_v1, (P,), 0, V)
            delta_max = max(1, min(4, V // 8))  # stay within ~45 deg on the ring
            delta = jax.random.randint(k_v2, (P,), 1, delta_max + 1)
            sign = jax.random.bernoulli(k_sign, 0.5, (P,)).astype(jnp.int32) * 2 - 1
            off2 = (off1 + sign * delta) % V
            if cfg.far_pair_frac > 0.0:
                # wide-baseline pairs at any separation; positives exist
                # wherever views are covisible (adaptive tau finds them)
                off_far = jax.random.randint(k_far, (P,), 1, V)
                use_far = jax.random.bernoulli(k_fsel, cfg.far_pair_frac, (P,))
                off2 = jnp.where(use_far, (off1 + off_far) % V, off2)
            return (scene_sel[:, None] * V + jnp.stack([off1, off2], -1)).reshape(-1)
        return jax.random.randint(k_batch, (cfg.batch_images,), 0, n_total)

    def step_fn(carry, i):
        params, opt_state, key = carry
        key, k_batch, k_aug = jax.random.split(key, 3)
        batch_idx = _sample_batch(k_batch)
        (loss, (l2, rp, ct)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_idx, k_aug
        )
        lr = _lr_at(cfg, step0 + i)
        finite = jnp.isfinite(loss)
        if cfg.grad_clip_norm > 0.0:
            from acezero_tpu.training.optim import clip_global_norm, clip_per_row_norm

            enc_grads, _ = clip_global_norm(grads["encoder"], cfg.grad_clip_norm)
            # heads clip per scene so one diverging head cannot shrink (or
            # dominate) everyone else's update through a shared scale
            head_grads, _ = clip_per_row_norm(grads["heads"], cfg.grad_clip_norm)
            grads = {"encoder": enc_grads, "heads": head_grads}
        # split updates: heads learn fast; the shared encoder updates gently
        # and without weight decay (decayed dead-ReLU channels never recover)
        enc_opt, head_opt = opt_state
        enc_params, enc_opt = adamw_update(
            params["encoder"], grads["encoder"], enc_opt,
            lr * cfg.encoder_lr_scale, weight_decay=cfg.encoder_weight_decay,
            enabled=finite,
        )
        head_params, head_opt = adamw_update(
            params["heads"], grads["heads"], head_opt, lr, enabled=finite
        )
        params = {"encoder": enc_params, "heads": head_params}
        opt_state = (enc_opt, head_opt)
        return (params, opt_state, key), {
            "loss": loss, "coord_l2": l2, "repro": rp, "contrast": ct
        }

    (params, opt_state, key), stats = jax.lax.scan(
        step_fn, (params, opt_state, key), jnp.arange(cfg.chunk_steps)
    )
    return params, opt_state, key, stats


def pretrain_encoder(
    cfg: PretrainConfig = PretrainConfig(),
    output_path: str | Path | None = None,
    corpus: dict | None = None,
) -> dict:
    """Run the pretraining; returns {'encoder': params, 'stats': ...}."""
    t0 = time.time()
    if corpus is None:
        _logger.info(
            "Rendering corpus: %d scenes x %d views at %dx%d",
            cfg.num_scenes, cfg.views_per_scene, cfg.image_h, cfg.image_w,
        )
        corpus = build_corpus(cfg)
    data = {
        "images_u8": jnp.asarray(corpus["images_u8"]),
        "coords": jnp.asarray(corpus["coords"]),
        "w2c": jnp.asarray(corpus["w2c"]),
        "focals": jnp.asarray(corpus["focals"]),
        "scene_ids": jnp.asarray(corpus["scene_ids"]),
    }
    if cfg.exact_supervision:
        if "box_half" not in corpus:
            raise ValueError(
                "exact_supervision=True needs corpus geometry (box_half/"
                "occ_boxes/c2w from build_corpus); pass exact_supervision="
                "False for external corpora without it"
            )
        data["c2w"] = jnp.asarray(corpus["c2w"])
        data["box_half"] = jnp.asarray(corpus["box_half"])
        data["occ_boxes"] = jnp.asarray(corpus["occ_boxes"])
    _logger.info("Corpus ready in %.1fs", time.time() - t0)

    key = jax.random.PRNGKey(cfg.seed)
    k_enc, k_heads, k_train = jax.random.split(key, 3)
    head_cfg = HeadConfig(num_head_blocks=cfg.head_blocks)

    # per-scene mean camera centers (scene-mean buffers)
    means = []
    for s in range(cfg.num_scenes):
        m = corpus["scene_ids"] == s
        c2w_t = np.linalg.inv(corpus["w2c"][m].astype(np.float64))[:, :3, 3]
        means.append(jnp.asarray(c2w_t.mean(axis=0), jnp.float32))
    params = {
        "encoder": init_encoder_params(k_enc),
        "heads": _stack_heads(jax.random.split(k_heads, cfg.num_scenes), head_cfg, means),
    }
    opt_state = (adamw_init(params["encoder"]), adamw_init(params["heads"]))

    step = 0
    history = []
    while step < cfg.steps:
        params, opt_state, k_train, stats = _pretrain_chunk(
            params, opt_state, data, k_train, jnp.asarray(step, jnp.int32), cfg, head_cfg
        )
        step += cfg.chunk_steps
        last = {k: float(np.asarray(v)[-1]) for k, v in stats.items()}
        history.append(last)
        _logger.info(
            "pretrain step %5d/%d  loss %.4f  coord_l2 %.4f  repro %.2f  contrast %.3f  (%.0fs)",
            step, cfg.steps, last["loss"], last["coord_l2"], last["repro"],
            last.get("contrast", 0.0), time.time() - t0,
        )

    encoder = jax.device_get(params["encoder"])
    if output_path is not None:
        save_encoder(output_path, encoder)
        _logger.info("Saved pretrained encoder to %s", output_path)
    return {"encoder": encoder, "history": history, "seconds": time.time() - t0}


def pretrain_encoder_select(
    cfg: PretrainConfig = PretrainConfig(),
    n_candidates: int = 3,
    output_path: str | Path | None = None,
) -> dict:
    """Train several candidate encoders and keep the best by measured quality.

    Pretraining outcome varies strongly between runs with identical configs
    (round-2 measurement: 27%-57% cross-view match@10cm for one recipe), so
    the artifact that ships is chosen by the two quality probes in
    pretrain.encoder_eval (feature matching + short scene-map fit), not by
    the training loss. The corpus is rendered once and shared; candidates
    differ only in the training PRNG seed.
    """
    from dataclasses import replace as _replace

    from acezero_tpu.pretrain.encoder_eval import evaluate_encoder

    corpus = build_corpus(cfg)
    best = None
    results = []
    for c in range(n_candidates):
        ccfg = _replace(cfg, seed=cfg.seed + 101 * c)
        # checkpoint every candidate as it completes — a long selection run
        # must not lose finished work if a later candidate dies or stalls
        cand_path = (
            Path(output_path).with_suffix(f".cand{c}.pt")
            if output_path is not None
            else None
        )
        res = pretrain_encoder(ccfg, corpus=corpus, output_path=cand_path)
        import jax.numpy as _jnp
        import jax as _jax

        enc_dev = _jax.tree.map(_jnp.asarray, res["encoder"])
        scores = evaluate_encoder(enc_dev)
        _logger.info(
            "candidate %d/%d: match %.1f%% shortfit %.1f%% -> combined %.1f",
            c + 1, n_candidates, scores.match_at_10cm,
            scores.shortfit_inlier10 or float("nan"), scores.combined,
        )
        results.append({"seed": ccfg.seed, "scores": scores})
        if best is None or scores.combined > best[1].combined:
            best = (res, scores)
    res, scores = best
    if output_path is not None:
        save_encoder(output_path, res["encoder"])
        _logger.info(
            "Saved best candidate (match %.1f%%, shortfit %.1f%%) to %s",
            scores.match_at_10cm, scores.shortfit_inlier10 or float("nan"),
            output_path,
        )
    return {"encoder": res["encoder"], "scores": scores, "candidates": results}
