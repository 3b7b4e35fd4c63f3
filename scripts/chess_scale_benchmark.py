#!/usr/bin/env python3
"""Chess-scale end-to-end benchmark: a ~2.4k-frame forward-facing sweep.

The BASELINE north star is ~4000-frame 7-Scenes chess in <5 minutes on the
reference V100 (/root/reference/scripts/reconstruct_7scenes.sh:51,
/root/reference/README.md:46-47). This script produces the equivalent
evidence hermetically: a thousands-of-frames synthetic scene in the chess
geometry class (handheld forward-facing scan, f=525, 480x640), a full
reconstruction on one chip, and a JSON report with wall-clock, per-stage
breakdown, registration rates, and @5cm/5deg accuracy vs exact GT.

Usage:
  python scripts/chess_scale_benchmark.py --generate_only   # CPU, ~15 min
  python scripts/chess_scale_benchmark.py                   # full run on TPU
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

_logger = logging.getLogger("chess_scale")

SCENE_KW = dict(
    seed=4242, look="sweep", focal=525.0, n_occluders=2, texture_octaves=3
)


def generate(scene_dir: Path, views: int, h: int, w: int) -> None:
    from PIL import Image

    from acezero_tpu.data.synthetic import render_scene

    if (scene_dir / "focal_length.txt").exists():
        n = len(list(scene_dir.glob("*.png")))
        if n >= views:
            _logger.info("Scene already generated (%d frames).", n)
            return
    scene_dir.mkdir(parents=True, exist_ok=True)
    t0 = time.time()
    scene = render_scene(views, h=h, w=w, **SCENE_KW)
    for i in range(views):
        stem = scene_dir / f"frame_{i:05d}"
        Image.fromarray(scene.images_u8[i]).save(f"{stem}.png")
        # f16 depth: only the 5 seed frames are ever read back; mm precision
        np.save(f"{stem}_depth.npy", scene.depth[i].astype(np.float16))
        np.savetxt(f"{stem}_pose.txt", scene.poses_c2w[i])
    (scene_dir / "focal_length.txt").write_text(f"{scene.focal}\n")
    _logger.info("Generated %d frames in %.1f min.", views, (time.time() - t0) / 60)


def run(scene_dir: Path, out_dir: Path, encoder_path: Path, run_seed: int) -> dict:
    from acezero_tpu.evalpose import evaluate_poses
    from acezero_tpu.io.pose_files import load_pose_files_glob, read_pose_file
    from acezero_tpu.reconstruct import AceZeroConfig, AceZeroPipeline
    from acezero_tpu.utils.profiling import _STAGE_COUNTS, _STAGE_TOTALS, reset_stages

    focal = float((scene_dir / "focal_length.txt").read_text())
    cfg = AceZeroConfig(
        rgb_files=str(scene_dir / "*.png"),
        results_folder=out_dir,
        depth_files=str(scene_dir / "*_depth.npy"),
        use_external_focal_length=focal,
        encoder_path=encoder_path,
        random_seed=run_seed,
        base_seed=run_seed + 784,
    )
    reset_stages()
    t0 = time.time()
    pipeline = AceZeroPipeline(cfg)
    result = pipeline.run()
    wall = time.time() - t0

    entries = read_pose_file(out_dir / "poses_final.txt")
    gt = load_pose_files_glob(str(scene_dir / "*_pose.txt"))
    errors = evaluate_poses(entries, gt, alignment_conf_threshold=500)
    return {
        "n_frames": len(gt),
        "acc_5cm5deg": errors.accuracy,
        "median_rot_deg": errors.median_rot_deg,
        "median_t_cm": errors.median_trans_cm,
        "reg_rate_500": result["registration_rates"][0],
        "iterations": result["iterations"],
        "rate_history": result.get("rate_history"),
        "wall_minutes": wall / 60.0,
        "stages_s": {k: round(v, 1) for k, v in sorted(_STAGE_TOTALS.items())},
        "stage_calls": dict(_STAGE_COUNTS),
    }


def main(argv=None) -> int:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s: %(message)s", datefmt="%H:%M:%S",
    )
    p = argparse.ArgumentParser()
    p.add_argument("--scene_dir", type=Path, default=Path("/tmp/acezero_chess_scale/scene"))
    p.add_argument("--out", type=Path, default=REPO / "results" / "chess_scale")
    p.add_argument("--encoder_path", type=Path, default=REPO / "weights" / "tpu_encoder_v6.pt")
    p.add_argument("--views", type=int, default=2400)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--seed", type=int, default=1305)
    p.add_argument("--generate_only", action="store_true")
    p.add_argument("--label", type=str, default="warm")
    p.add_argument("--log_compiles", action="store_true",
                   help="log every XLA compilation (program-count diagnosis)")
    args = p.parse_args(argv)

    if args.log_compiles:
        import jax

        jax.config.update("jax_log_compiles", True)

    generate(args.scene_dir, args.views, args.height, args.width)
    if args.generate_only:
        return 0

    from acezero_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import subprocess

    try:
        sha = subprocess.run(
            ["git", "-C", str(REPO), "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:  # noqa: BLE001
        sha = "unknown"

    run_dir = args.out / f"run_{args.label}"
    rec = {
        "label": args.label,
        "git_sha": sha,
        "encoder": args.encoder_path.name,
        **run(args.scene_dir, run_dir, args.encoder_path, args.seed),
    }
    args.out.mkdir(parents=True, exist_ok=True)
    with open(args.out / "REPORT.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
