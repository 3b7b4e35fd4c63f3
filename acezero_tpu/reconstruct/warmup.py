"""Pre-dispatch of the reconstruction's compiled programs ("prewarming").

On the shared-host axon relay every DISTINCT compiled program pays a large,
high-variance first-call cost (measured 7-330 s per program at identical
code — server-side compile/load), which dominated the round-4 chess-scale
wall-clock spread (8.4-15.7 min across clean runs). Dispatch is async: a
call returns immediately and the server compiles/executes in the background.

This module dispatches ONE dummy call of every big program the pipeline will
need — seed train chunk, mapping/refit train chunk (unified), buffer-fill
segment + per-chunk programs, registration coords + RANSAC chunk, multi-head
seed-scoring coords — right at pipeline construction, BEFORE the host spends
~30 s decoding the scene's images. The compiles then overlap host decode and
the early pipeline stages instead of serializing into whichever stage
happens to trigger them.

All dummy inputs are created ON DEVICE (jnp.zeros/full — no host->device
payloads); shapes are derived from the same helpers the real stages use
(buffer_alloc_rows, the pipeline's own config builders), so the warmed
executables are the exact ones the run hits. Results are never fetched;
mispredicted shapes (e.g. mixed-resolution datasets) waste a few seconds of
device time and nothing else.

No reference analogue: the reference's per-stage subprocesses pay PyTorch's
eager dispatch instead (/root/reference/ace_zero_util.py:11-52).
"""

from __future__ import annotations

import logging
import time

import jax
import jax.numpy as jnp

_logger = logging.getLogger(__name__)


def predict_canvas_hw(first_image_path: str, short_size: int) -> tuple[int, int]:
    """Canvas shape prediction from ONE image header (no pixel decode),
    replicating data.images.decode_to_canvas's sizing for uniform datasets."""
    from PIL import Image

    with Image.open(first_image_path) as img:
        w0, h0 = img.size
    scale = short_size / min(w0, h0)
    h1, w1 = round(h0 * scale), round(w0 * scale)
    rup = lambda x: ((x + 7) // 8) * 8  # noqa: E731
    return rup(h1), rup(w1)


def prewarm_programs(pl, n_images: int, canvas_hw: tuple[int, int]) -> None:
    """Warm each big compiled program from a daemon THREAD (see module doc).

    A first call of a jitted program blocks its calling thread on the
    compile, so warming inline would just move the cost earlier; in a thread
    the compile RPCs (which release the GIL) overlap the main thread's PNG
    decode and the early stages. jit caches are thread-safe — if a stage
    reaches a program mid-compile it simply waits, exactly as it would have
    without the warmup.

    `pl` is the AceZeroPipeline under construction (its config builders are
    the single source of the static jit keys). Never raises: any failure
    degrades to just-in-time compilation.
    """
    import threading

    def _run():
        t0 = time.time()
        try:
            _prewarm(pl, n_images, canvas_hw)
            _logger.info(
                "Prewarm finished (%d frames, canvas %s) in %.1fs (threaded).",
                n_images, canvas_hw, time.time() - t0,
            )
        except Exception as exc:  # noqa: BLE001 — warmup must never break a run
            _logger.warning("Program prewarm skipped: %s", exc)

    t = threading.Thread(target=_run, name="acezero-prewarm", daemon=True)
    t.start()
    pl._prewarm_thread = t


def _prewarm(pl, n: int, canvas_hw: tuple[int, int]) -> None:
    from acezero_tpu.geometry.projection import get_pixel_grid
    from acezero_tpu.models.head import init_head_params
    from acezero_tpu.models.posenet import init_posenet_params
    from acezero_tpu.registration.driver import (
        _coords_chunk_from_root,
        _coords_chunk_multi,
        _ransac_chunk,
    )
    from acezero_tpu.training.buffer import (
        allocate_buffer,
        buffer_alloc_rows,
        next_bucket,
    )
    from acezero_tpu.training.optim import adamw_init
    from acezero_tpu.training.schedule import init_schedule
    from acezero_tpu.training.trainer import TrainState, _train_chunk

    cfg = pl.cfg
    enc = pl.encoder_params
    head_cfg = pl.head_cfg
    H, W = canvas_hw
    feat_dim = enc["res2_conv3"]["w"].shape[-1]
    buffer_cfg = pl._buffer_cfg()
    S_img = buffer_cfg.samples_per_image
    chunk_imgs = buffer_cfg.image_chunk
    key = jax.random.PRNGKey(7)

    # device-side dummy scene root (no host->device transfer)
    root_canv = jnp.zeros((n, H, W), jnp.uint8)
    root_sizes = jnp.tile(jnp.asarray([[H, W]], jnp.int32), (n, 1))
    grid = get_pixel_grid(H // 8, W // 8, 8)

    dummy_head = init_head_params(key, head_cfg, jnp.zeros(3))

    def _train_warm(train_cfg, pose_rows: int, n_fill: int):
        _, alloc = buffer_alloc_rows(buffer_cfg, n_fill, 1, True)
        buf = allocate_buffer(alloc, feat_dim)
        ctx = {
            "poses_w2c": jnp.tile(jnp.eye(4, dtype=jnp.float32)[None, :3, :4],
                                  (pose_rows, 1, 1)),
            "focals": jnp.ones((pose_rows,), jnp.float32),
            "ppx": jnp.asarray(W / 2.0, jnp.float32),
            "ppy": jnp.asarray(H / 2.0, jnp.float32),
        }
        if train_cfg.pose_refinement == "mlp":
            pose_params = init_posenet_params(key)
        elif train_cfg.pose_refinement == "naive":
            pose_params = {"pose_buffer": ctx["poses_w2c"]}
        else:
            pose_params = {}
        state = TrainState(
            head_params=dummy_head,
            head_opt=adamw_init(dummy_head),
            pose_params=pose_params,
            pose_opt=adamw_init(pose_params),
            focal_g=jnp.asarray(0.0, jnp.float32),
            focal_opt=adamw_init(jnp.asarray(0.0, jnp.float32)),
            sched=init_schedule(train_cfg.schedule),
            iteration=jnp.asarray(0, jnp.int32),
            nan_steps=jnp.asarray(0, jnp.int32),
            key=key,
        )
        out, _ = _train_chunk(state, buf, ctx, train_cfg, head_cfg, train_cfg.chunk_steps)
        return out.iteration  # tiny leaf keeps the dispatch alive; never fetched

    pending = []
    bucket = max(next_bucket(n, 8), 8)
    targets = jnp.zeros((bucket, H // 8, W // 8, 3), jnp.float32)

    # warm in the order the pipeline needs the programs. The seed train
    # chunk goes FIRST: its server-side load is the longest (~45-60 s) and
    # it gates the whole seed stage, while the per-chunk fill program it
    # needs beforehand loads in a few seconds.

    # 1. seed train chunk (1-image buffer, depth supervision, no refinement)
    seed_cfg = pl._base_train_cfg(cfg.seed_iterations, use_depth=True, refine=False)
    pending.append(_train_warm(seed_cfg, pose_rows=8, n_fill=1))

    # 2. per-chunk fill program (seed-round buffer fill + pass tails)
    from acezero_tpu.training.buffer import _fill_chunk, _fill_pass

    rows = _fill_chunk(
        enc, root_canv[:chunk_imgs], root_sizes[:chunk_imgs],
        targets[:chunk_imgs], key, buffer_cfg,
    )
    pending.append(rows["theta"])

    # 3. seed-scoring coords (shared encoder pass, S heads) + the
    #    (cap-dynamic) RANSAC chunk shared by scoring and registration
    reg_cfg = pl._registration_cfg()
    B = reg_cfg.frame_chunk
    idx = jnp.arange(B, dtype=jnp.int32) % n
    keys = jax.random.split(key, B)
    focals = jnp.full((B,), 500.0, jnp.float32)
    ppx = jnp.full((B,), W / 2.0, jnp.float32)
    ppy = jnp.full((B,), H / 2.0, jnp.float32)
    S = cfg.try_seeds
    if cfg.seed_parallel and S > 1:
        stacked = jax.tree.map(lambda x: jnp.stack([x] * S), dummy_head)
        coords_m, mask_m = _coords_chunk_multi(
            enc, stacked, head_cfg, root_canv[:B], root_sizes[:B]
        )
        out_m = _ransac_chunk(
            coords_m[0], mask_m, grid, focals, ppx, ppy, keys, reg_cfg.ransac,
            reg_cfg.ransac.refinement_steps,
        )
        pending.append(out_m["inlier_count"])

    # 4. registration coords-from-root (+ the same RANSAC program)
    coords, mask_lr = _coords_chunk_from_root(
        enc, dummy_head, head_cfg, root_canv, root_sizes, idx
    )
    out = _ransac_chunk(
        coords, mask_lr, grid, focals, ppx, ppy, keys, reg_cfg.ransac,
        reg_cfg.ransac.refinement_steps,
    )
    pending.append(out["inlier_count"])

    # 5. fill segment program (the mapping-round fast path), full-size only
    seg_chunks = max(1, 1_048_576 // (chunk_imgs * S_img))
    seg_len = seg_chunks * chunk_imgs
    if n >= seg_len:
        staging = allocate_buffer(seg_len * S_img, feat_dim)
        order = jnp.arange(seg_len, dtype=jnp.int32) % n
        staging = _fill_pass(
            staging, enc, root_canv, root_sizes, targets, order, order, key, 0,
            buffer_cfg,
        )
        pending.append(staging["theta"])

    # 6. unified mapping/refit train chunk (full-scene pose bucket)
    map_cfg = pl._base_train_cfg(
        cfg.iterations, use_depth=False, refine=True, pose_bucket=bucket
    )
    pending.append(_train_warm(map_cfg, pose_rows=bucket, n_fill=n))

    # 7. loop-closure coords+features chunk (the probe's big program,
    #    16 s compile measured) — only when the probe will run
    if cfg.loop_closure and cfg.loop_closure_probe_frames > 0:
        from acezero_tpu.reconstruct.loopclose import (
            LoopCloseConfig,
            _coords_feats_chunk_from_root,
        )

        cc, mm, ff = _coords_feats_chunk_from_root(
            enc, dummy_head, head_cfg, root_canv, root_sizes,
            jnp.arange(64, dtype=jnp.int32) % n,
            feature_dim=LoopCloseConfig().feature_dim,
        )
        pending.append(ff)

    # keep dispatches alive on the pipeline; nothing is ever fetched
    pl._prewarm_refs = pending
