#!/usr/bin/env python3
"""Warm-start (seed-network) benchmark: the T2-training-videos recipe shape.

Reference flow (scripts/reconstruct_t2_training_videos_warmstart.sh:52-66 +
ace_zero.py:175-177): map a POSED subset of the capture with train_ace.py,
then seed a full ACE0 reconstruction of everything with that network via
--seed_network, skipping the seed stage.

This script reproduces that shape hermetically on a held-out synthetic
scene: stage 1 trains a map on a GT-posed subset (the COLMAP-posed video
frames stand-in), stage 2 reconstructs the full scene from that network,
and the row records accuracy + wall-clock against the cold-start rows in
results/heldout/REPORT.jsonl.

Recorded result (results/heldout/REPORT.jsonl, depth="warmstart", sha
7c9d0f1): sweep_a from a 20-frame posed subset — stage 1 maps in 0.85 min,
the warm map registers 100% of frames in its FIRST pass (rate_history
starts at 1.0; the seed stage never runs), and the full reconstruction
finishes at 100% @5cm/5deg in 4.7 min total. Flow mechanics are also
covered by tests/test_warmstart.py.
"""

from __future__ import annotations

import argparse
import json
import logging
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
import sys

sys.path.insert(0, str(REPO))

_logger = logging.getLogger("warmstart_bench")


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=Path, default=REPO / "results" / "heldout")
    p.add_argument("--scene", type=str, default="sweep_a")
    p.add_argument("--encoder_path", type=Path, default=REPO / "weights" / "tpu_encoder_v6.pt")
    p.add_argument("--subset", type=int, default=20, help="posed warm-up frames")
    p.add_argument("--views", type=int, default=60)
    p.add_argument("--seed", type=int, default=1305)
    args = p.parse_args(argv)

    from acezero_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from acezero_tpu.evalpose import evaluate_poses
    from acezero_tpu.io.pose_files import load_pose_files_glob, read_pose_file
    from acezero_tpu.models import torch_io
    from acezero_tpu.models.head import HeadConfig
    from acezero_tpu.reconstruct import AceZeroConfig, AceZeroPipeline
    from acezero_tpu.training.buffer import BufferConfig
    from acezero_tpu.training.loss import ReproLossConfig
    from acezero_tpu.training.schedule import ScheduleConfig
    from acezero_tpu.training.trainer import MappingTrainer, TrainConfig
    from scripts.heldout_benchmark import SCENES, make_scene_dir

    kwargs = dict(SCENES)[args.scene]
    scene_dir = make_scene_dir(args.out, args.scene, kwargs, args.views, 480, 640)
    focal = float((scene_dir / "focal_length.txt").read_text())

    t0 = time.time()

    # ---- stage 1: map the posed subset (reference train_ace.py with
    # --pose_files on the COLMAP-posed video subset, pose_refinement mlp,
    # 10k iterations — reconstruct_t2_training_videos_warmstart.sh:52-60)
    run_dir = args.out / f"{args.scene}_warmstart"
    probe_cfg = AceZeroConfig(
        rgb_files=str(scene_dir / "*.png"),
        results_folder=run_dir,
        use_external_focal_length=focal,
        encoder_path=args.encoder_path,
        random_seed=args.seed,
        base_seed=args.seed + 784,
    )
    pipeline_probe = AceZeroPipeline(probe_cfg)
    gt_poses = load_pose_files_glob(str(scene_dir / "*_pose.txt"))
    sub_idx = np.linspace(0, args.views - 1, args.subset).round().astype(int)
    subset = pipeline_probe.scene.subset(sub_idx)
    subset.poses_c2w = np.stack([gt_poses[i] for i in sub_idx]).astype(np.float32)
    subset.pose_valid = np.ones(len(sub_idx), bool)

    head_cfg = HeadConfig(num_head_blocks=1, use_homogeneous=True)
    trainer = MappingTrainer(
        subset,
        pipeline_probe.encoder_params,
        head_cfg,
        TrainConfig(
            batch_size=5120,
            schedule=ScheduleConfig(schedule="1cyclepoly", iterations=10000,
                                    learning_rate_max=0.003),
            loss=ReproLossConfig(total_iterations=10000, loss_type="tanh"),
            pose_refinement="mlp",
            pose_refinement_wait=5000,
        ),
        BufferConfig(),
        base_seed=args.seed + 99,
    )
    warm = trainer.train()
    seed_net = run_dir / "warmstart_head.pt"
    run_dir.mkdir(parents=True, exist_ok=True)
    torch_io.save_head(seed_net, jax.device_get(warm["head_params"]), head_cfg)
    t_stage1 = time.time() - t0

    # ---- stage 2: full reconstruction seeded with the warm network --------
    cfg = AceZeroConfig(
        rgb_files=str(scene_dir / "*.png"),
        results_folder=run_dir,
        use_external_focal_length=focal,
        encoder_path=args.encoder_path,
        seed_network=seed_net,
        random_seed=args.seed,
        base_seed=args.seed + 784,
    )
    pipeline = AceZeroPipeline(cfg, encoder_params=pipeline_probe.encoder_params)
    result = pipeline.run()
    wall = time.time() - t0

    entries = read_pose_file(run_dir / "poses_final.txt")
    errors = evaluate_poses(entries, gt_poses, alignment_conf_threshold=500)

    import subprocess

    try:
        sha = subprocess.run(
            ["git", "-C", str(REPO), "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:  # noqa: BLE001
        sha = "unknown"

    rec = {
        "scene": args.scene,
        "run": 0,
        "encoder": args.encoder_path.name,
        "git_sha": sha,
        "depth": "warmstart",  # no depth source at all: the seed net replaces it
        "focal": "known",
        "mode": f"seed_network from {args.subset}-frame posed subset",
        "acc_5cm5deg": errors.accuracy,
        "median_rot_deg": errors.median_rot_deg,
        "median_t_cm": errors.median_trans_cm,
        "reg_rate_500": result["registration_rates"][0],
        "iterations": result["iterations"],
        "rate_history": result.get("rate_history"),
        "stage1_minutes": t_stage1 / 60.0,
        "wall_minutes": wall / 60.0,
    }
    with open(args.out / "REPORT.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
