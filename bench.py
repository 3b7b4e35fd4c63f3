#!/usr/bin/env python3
"""Benchmark: mapping-training throughput at reference shapes on one chip.

Measures steady-state fused training steps/sec at the reference workload
(batch 5120 patches x 512 features, head with 1 extra block, MLP pose
refinement + focal refinement enabled — the dominant cost of an ACE0
reconstruction round), plus registration frames/sec and buffer-fill rate as
secondary numbers on stderr.

Baseline: the reference trains 25k iterations in ~4 minutes on a V100
(ACE paper "mapping in 5 minutes" minus ~1 minute buffer fill), i.e.
~104 iterations/sec with fp16 autocast. vs_baseline = ours / 104.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_TRAIN_STEPS_PER_SEC = 104.0  # V100 fp16, reference recipe


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from acezero_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    log(f"devices: {jax.devices()}")

    from acezero_tpu.models.encoder import init_encoder_params
    from acezero_tpu.models.head import HeadConfig, init_head_params
    from acezero_tpu.models.posenet import init_posenet_params
    from acezero_tpu.training.loss import ReproLossConfig
    from acezero_tpu.training.optim import adamw_init
    from acezero_tpu.training.schedule import ScheduleConfig, init_schedule
    from acezero_tpu.training.trainer import TrainConfig, TrainState, _train_chunk

    key = jax.random.PRNGKey(0)
    head_cfg = HeadConfig(num_head_blocks=1)
    n_imgs, rows = 200, 1_000_000
    k1, k2, k3, k4 = jax.random.split(key, 4)
    head_params = init_head_params(k1, head_cfg, jnp.zeros(3))
    pose_params = init_posenet_params(k2)

    buffer = {
        "features": jax.random.normal(k3, (rows, 512), jnp.bfloat16),
        "target_px": jax.random.uniform(k4, (rows, 2), minval=0.0, maxval=632.0),
        "target_crds": jnp.zeros((rows, 3), jnp.float32),
        "img_idx": jnp.tile(jnp.arange(n_imgs, dtype=jnp.int32), rows // n_imgs),
        "theta": jnp.zeros((rows,), jnp.float32),
        "scale": jnp.ones((rows,), jnp.float32),
    }
    poses = jnp.tile(jnp.eye(4, dtype=jnp.float32)[:3][None], (n_imgs, 1, 1))
    ctx = {
        "poses_w2c": poses,
        "focals": jnp.full((n_imgs,), 525.0, jnp.float32),
        "ppx": jnp.asarray(320.0, jnp.float32),
        "ppy": jnp.asarray(240.0, jnp.float32),
    }

    steps = 500
    cfg = TrainConfig(
        batch_size=5120,
        schedule=ScheduleConfig(schedule="1cyclepoly", iterations=100_000),
        loss=ReproLossConfig(loss_type="dyntanh", total_iterations=100_000),
        pose_refinement="mlp",
        refine_calibration=True,
        chunk_steps=steps,
    )
    state = TrainState(
        head_params=head_params,
        head_opt=adamw_init(head_params),
        pose_params=pose_params,
        pose_opt=adamw_init(pose_params),
        focal_g=jnp.asarray(0.0, jnp.float32),
        focal_opt=adamw_init(jnp.asarray(0.0, jnp.float32)),
        sched=init_schedule(cfg.schedule),
        iteration=jnp.asarray(0, jnp.int32),
        nan_steps=jnp.asarray(0, jnp.int32),
        key=jax.random.PRNGKey(7),
    )

    # warmup/compile. NOTE: on the axon relay backend jax.block_until_ready
    # is a no-op (fully async dispatch) — synchronize by fetching a scalar.
    t0 = time.time()
    state, _ = _train_chunk(state, buffer, ctx, cfg, head_cfg, steps)
    _ = int(state.iteration)
    compile_s = time.time() - t0
    log(f"train compile+first {steps} steps: {compile_s:.1f}s")

    times = []
    for _rep in range(2):
        t0 = time.time()
        state, stats = _train_chunk(state, buffer, ctx, cfg, head_cfg, steps)
        _ = int(state.iteration)
        times.append(time.time() - t0)
    dt = min(times)
    steps_per_sec = steps / dt
    log(f"steady-state: {steps} steps in {dt:.2f}s -> {steps_per_sec:.1f} steps/s")
    assert np.isfinite(np.asarray(stats["loss"])).all()

    # ---- secondary: registration throughput ------------------------------
    try:
        from acezero_tpu.geometry.projection import get_pixel_grid
        from acezero_tpu.registration.ransac import RansacConfig, estimate_poses_batch

        B, h, w = 32, 60, 80
        grid = get_pixel_grid(h, w)
        depth = jax.random.uniform(jax.random.PRNGKey(1), (B, h, w), minval=2.0, maxval=8.0)
        x = (grid[None, ..., 0] - 320.0) / 525.0 * depth
        y = (grid[None, ..., 1] - 240.0) / 525.0 * depth
        coords = jnp.stack([x, y, depth], axis=-1)
        rcfg = RansacConfig(hypotheses=32, max_tries=16)
        args = (
            coords,
            jnp.ones((B, h, w), bool),
            grid,
            jnp.full((B,), 525.0),
            jnp.full((B,), 320.0),
            jnp.full((B,), 240.0),
        )
        out = estimate_poses_batch(jax.random.PRNGKey(2), *args, rcfg)
        _ = int(out["inlier_count"][0])
        t0 = time.time()
        out = estimate_poses_batch(jax.random.PRNGKey(3), *args, rcfg)
        _ = int(out["inlier_count"][0])
        reg_fps = B / (time.time() - t0)
        log(f"registration: {reg_fps:.1f} frames/s (32 hyps, 60x80 cells)")
    except Exception as exc:  # noqa: BLE001
        reg_fps = None
        log(f"registration bench skipped: {exc}")

    # ---- secondary: buffer-fill rate (the round-2 warp win) --------------
    try:
        from acezero_tpu.training.buffer import BufferConfig, fill_training_buffer

        n_fill, H, W = 128, 480, 640
        imgs = np.asarray(
            jax.device_get(
                jax.random.randint(jax.random.PRNGKey(5), (n_fill, H, W), 0, 255)
            ),
            np.uint8,
        )
        szs = np.tile(np.asarray([[H, W]], np.int32), (n_fill, 1))
        enc_params = init_encoder_params(jax.random.PRNGKey(6))
        bcfg = BufferConfig(max_buffer_size=n_fill * 1024, samples_per_image=1024,
                            max_dataset_passes=1)
        buf = fill_training_buffer(jax.random.PRNGKey(8), enc_params, imgs, szs, bcfg)
        _ = int(jax.device_get(buf["img_idx"][0]))  # sync (compile incl.)
        t0 = time.time()
        buf = fill_training_buffer(jax.random.PRNGKey(9), enc_params, imgs, szs, bcfg)
        _ = int(jax.device_get(buf["img_idx"][0]))
        fill_ms = (time.time() - t0) / n_fill * 1000.0
        log(f"buffer fill: {fill_ms:.1f} ms/image (480x640, 1024 samples, 1 pass)")
    except Exception as exc:  # noqa: BLE001
        fill_ms = None
        log(f"buffer-fill bench skipped: {exc}")

    # ONE JSON line on stdout (driver contract); secondary metrics +
    # baseline provenance ride as extra keys on the same object
    result = {
        "metric": "mapping_train_steps_per_sec",
        "value": round(steps_per_sec, 1),
        "unit": "steps/s (batch 5120)",
        "vs_baseline": round(steps_per_sec / BASELINE_TRAIN_STEPS_PER_SEC, 2),
        "baseline_provenance": (
            "DERIVED, not measured: 104 steps/s = 25k iterations in ~4 min "
            "on a V100 (ACE paper 'mapping in 5 minutes' minus ~1 min "
            "buffer fill), fp16 autocast, reference recipe"
        ),
        "secondary": {},
    }
    if reg_fps is not None:
        result["secondary"]["registration_frames_per_sec"] = {
            "value": round(reg_fps, 1),
            "unit": "frames/s (32 hyps, 60x80 cells, one chip)",
            "note": (
                "single-pass registrar program on clean synthetic maps; "
                "the production driver adds the two-tier refit budget "
                "(registration/driver.py), which removes the round-2 "
                "pathology where one stubborn frame made a whole chunk pay "
                "the 100-step refineHyp cap (was 16-31 s per 60-frame "
                "chunk on noisy maps; round-3 chess-scale: 2400 real "
                "frames per round in 25-60 s incl. encoder+head inference)"
            ),
            "baseline": "~20-30 frames/s, reference DSAC* C++ on 12 CPU threads (measured r1)",
            "vs_baseline": round(reg_fps / 25.0, 2),
        }
    result["secondary"]["train_compile_plus_first_chunk_s"] = {
        "value": round(compile_s, 1),
        "unit": "s (500-step chunk; ~= steady-state chunk time when the "
                "persistent XLA cache at .xla_cache/ hits, compile wall "
                "otherwise)",
    }
    if fill_ms is not None:
        result["secondary"]["buffer_fill_ms_per_image"] = {
            "value": round(fill_ms, 1),
            "unit": "ms/image (480x640 canvas, 1024 samples/image, warm)",
            "baseline": "~15 ms/image, reference fill: 8M rows / ~1 min on V100 w/ 12 loader workers",
            "vs_baseline": round(15.0 / max(fill_ms, 1e-9), 2),
        }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
