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

    # ---- MFU: compiler-counted FLOPs/step vs chip bf16 peak ---------------
    # XLA's cost analysis counts every HLO flop in the compiled chunk
    # (fwd+bwd+optimizer for head, pose MLP, focal). Peak from the device
    # kind; "TPU v5 lite" (v5e) bf16 peak = 197 TFLOP/s, v5p = 459.
    mfu = flops_per_step = None
    try:
        # ANALYTIC matmul count: XLA cost_analysis under the axon relay does
        # not account the lax.scan body (it reports ~0.13 GFLOP for the
        # whole 500-step chunk), so FLOPs/step are summed from the actual
        # dense-layer shapes — fwd (2*B*in*out per layer) plus backward
        # (dgrad + wgrad = 2x fwd), the standard 3x-forward training count.
        # Elementwise loss/optimizer work is excluded (sub-percent).
        B = cfg.batch_size

        def _dense_flops(tree) -> float:
            total = 0.0
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
                if getattr(leaf, "ndim", 0) == 2 and str(path[-1]) == "['w']":
                    total += 2.0 * B * leaf.shape[0] * leaf.shape[1]
            return total

        fwd = _dense_flops(state.head_params) + _dense_flops(state.pose_params)
        flops_per_step = 3.0 * fwd
        kind = jax.devices()[0].device_kind.lower()
        peak = 459e12 if "v5p" in kind or "v5 p" in kind else 197e12
        mfu = flops_per_step * steps_per_sec / peak
        log(
            f"MFU: {flops_per_step / 1e9:.1f} GFLOP/step x {steps_per_sec:.0f} steps/s "
            f"= {flops_per_step * steps_per_sec / 1e12:.1f} TFLOP/s "
            f"/ {peak / 1e12:.0f} TFLOP/s peak ({kind}) = {mfu * 100:.1f}%"
        )
    except Exception as exc:  # noqa: BLE001
        log(f"MFU accounting skipped (cost_analysis unavailable): {exc}")

    # ---- secondary: registration throughput through the PRODUCTION driver
    # (register_frames: chunked host loop, two-tier refineHyp budget,
    # failure retries) on NOISY maps — the number that governs real
    # reconstruction wall-clock, not the clean-map single-program rate.
    # Scene-coordinate inference (encoder+head on 480x640 frames) runs for
    # real inside each chunk; its outputs are swapped for ground-truth maps
    # corrupted with 5 cm iid noise + 25% outliers so the refinement loops
    # do representative work (a random head would peg every lane at the
    # 100-step cap; a trained head is not available inside the bench).
    try:
        from acezero_tpu.data.images import DecodedImages
        from acezero_tpu.data.scene import SceneData
        from acezero_tpu.geometry.projection import get_pixel_grid
        from acezero_tpu.registration import driver as reg_driver
        from acezero_tpu.registration.driver import RegistrationConfig, register_frames
        from acezero_tpu.registration.ransac import RansacConfig

        B, H, W = 256, 480, 640
        h, w = H // 8, W // 8
        focal = 525.0
        rng = np.random.default_rng(11)
        # cameras on a ring looking inward, smooth per-frame depth fields
        grid = np.asarray(get_pixel_grid(h, w, 8))
        angles = rng.uniform(0, 2 * np.pi, B)
        c2w = np.tile(np.eye(4, dtype=np.float64)[None], (B, 1, 1))
        for i, a in enumerate(angles):
            fwd = np.array([-np.cos(a), 0.0, -np.sin(a)])
            up = np.array([0.0, -1.0, 0.0])
            right = np.cross(up, fwd); right /= np.linalg.norm(right)
            dwn = np.cross(fwd, right)
            c2w[i, :3, :3] = np.stack([right, dwn, fwd], axis=1)
            c2w[i, :3, 3] = -5.0 * fwd + rng.normal(0, 0.2, 3)
        depth = 3.0 + 2.0 * rng.random((B, h, w))
        x = (grid[None, ..., 0] - W / 2) / focal * depth
        y = (grid[None, ..., 1] - H / 2) / focal * depth
        p_cam = np.stack([x, y, depth], axis=-1)
        gt_maps = (
            np.einsum("bij,bhwj->bhwi", c2w[:, :3, :3], p_cam) + c2w[:, None, None, :3, 3]
        ).astype(np.float32)
        noisy = gt_maps + rng.normal(0, 0.05, gt_maps.shape).astype(np.float32)
        out_mask = rng.random((B, h, w)) < 0.25
        noisy = np.where(
            out_mask[..., None], rng.uniform(-6, 6, gt_maps.shape).astype(np.float32), noisy
        )
        noisy_dev = jnp.asarray(noisy)

        images = DecodedImages(
            canvases=np.asarray(
                jax.device_get(jax.random.randint(jax.random.PRNGKey(12), (B, H, W), 0, 255)),
                np.uint8,
            ),
            sizes=np.tile(np.asarray([[H, W]], np.int32), (B, 1)),
            orig_sizes=np.tile(np.asarray([[H, W]], np.int32), (B, 1)),
            scale_factors=np.ones(B, np.float32),
        )
        scene = SceneData(
            rgb_files=[f"bench_{i:04d}.png" for i in range(B)],
            images=images,
            poses_c2w=c2w.astype(np.float32),
            pose_valid=np.ones(B, bool),
            focals_canvas=np.full(B, focal, np.float32),
            focals_orig=np.full(B, focal, np.float32),
        )
        head_params = init_head_params(jax.random.PRNGKey(13), head_cfg, jnp.zeros(3))

        real_coords = reg_driver._coords_chunk_from_root

        def swap_coords(enc_p, head_p, hcfg, canv, sizes, idx, subsample=8):
            _, mask_lr = real_coords(enc_p, head_p, hcfg, canv, sizes, idx, subsample)
            return noisy_dev[idx], mask_lr

        reg_driver._coords_chunk_from_root = swap_coords
        try:
            rcfg = RegistrationConfig(
                ransac=RansacConfig(hypotheses=32, max_tries=16, refinement_steps=100),
                frame_chunk=64,
                refit_tier1=16,
            )
            enc_params = init_encoder_params(jax.random.PRNGKey(14))
            entries = register_frames(enc_params, head_params, head_cfg, scene, rcfg)
            t0 = time.time()
            entries = register_frames(enc_params, head_params, head_cfg, scene, rcfg)
            reg_fps = B / (time.time() - t0)
        finally:
            reg_driver._coords_chunk_from_root = real_coords
        # sanity: the recovered poses must actually be right, else the
        # throughput number is meaningless. Entries are matched to ground
        # truth BY FILE NAME: register_frames processes frames in a seeded
        # permutation and appends entries in that order
        # (registration/driver.py:288), so a positional entries[i] vs c2w[i]
        # comparison measures the chord between two random ring cameras
        # (2*5*sin45deg ~= 707 cm — the round-4 "703.1 cm" artifact).
        t_errs = [
            float(
                np.linalg.norm(
                    np.linalg.inv(e.pose_w2c)[:3, 3]
                    - c2w[int(e.rgb_file.split("_")[1].split(".")[0]), :3, 3]
                )
            )
            for e in entries
        ]
        med_t_cm = float(np.median(t_errs)) * 100.0
        log(
            f"registration (driver path, noisy maps): {reg_fps:.1f} frames/s, "
            f"median t err {med_t_cm:.1f} cm"
        )
        assert med_t_cm < 10.0, f"driver-path registration inaccurate: {med_t_cm:.1f} cm"
    except Exception as exc:  # noqa: BLE001
        reg_fps = None
        med_t_cm = None
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
            "unit": "frames/s (driver path: 32 hyps, 60x80 cells, 480x640 "
                    "encoder inference, two-tier refit, one chip)",
            "note": (
                "measured through registration.driver.register_frames on "
                "maps with 5 cm iid noise + 25% outliers (median recovered "
                f"pose error {med_t_cm:.1f} cm); includes the chunked host "
                "loop, real encoder+head inference per chunk, the two-tier "
                "refineHyp budget, and failure retries — the number that "
                "governs reconstruction wall-clock (round-3 note: the old "
                "clean-map single-program rate was 123 frames/s)"
            ),
            "baseline": "~20-30 frames/s, reference DSAC* C++ on 12 CPU threads (measured r1)",
            "vs_baseline": round(reg_fps / 25.0, 2),
        }
    if mfu is not None:
        result["secondary"]["train_step_mfu"] = {
            "value": round(mfu * 100, 1),
            "unit": "% of chip bf16 peak (analytic dense-layer FLOPs/step x "
                    "measured steps/s / peak)",
            "flops_per_step": round(flops_per_step / 1e9, 2),
            "flops_unit": "GFLOP/step (head + pose-MLP matmuls, fwd + 2x bwd; "
                          "XLA cost_analysis is unusable here — it does not "
                          "account the scan body under the axon relay)",
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
