"""Pose-evaluation CLI — flag-compatible with the reference eval_poses.py.

Computes %@5cm/5deg accuracy and median errors for an ACE pose file against
ground-truth 4x4 pose files (/root/reference/eval_poses.py:24-191).
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

from acezero_tpu.evalpose import evaluate_poses
from acezero_tpu.io.pose_files import load_pose_files_glob, read_pose_file

_logger = logging.getLogger(__name__)


def _strtobool(x: str) -> bool:
    return x.strip().lower() in ("1", "true", "yes", "y", "on")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Compute pose error metrics for an ACE pose file.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("ace_pose_file", type=Path)
    p.add_argument("gt_pose_files", type=str)
    p.add_argument("--estimate_alignment", type=_strtobool, default=True)
    p.add_argument("--estimate_alignment_scale", type=_strtobool, default=True)
    p.add_argument("--estimate_alignment_conf_threshold", type=float, default=500)
    p.add_argument("--pose_error_thresh_t", type=float, default=0.05)
    p.add_argument("--pose_error_thresh_r", type=float, default=5)
    return p


def main(argv: list[str] | None = None) -> int:
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)

    entries = read_pose_file(args.ace_pose_file)
    gt = load_pose_files_glob(args.gt_pose_files)

    errors = evaluate_poses(
        entries,
        gt,
        do_alignment=args.estimate_alignment,
        estimate_scale=args.estimate_alignment_scale,
        alignment_conf_threshold=args.estimate_alignment_conf_threshold,
        thresh_t=args.pose_error_thresh_t,
        thresh_r=args.pose_error_thresh_r,
    )
    _logger.info("===================================================")
    _logger.info("Test complete.")
    _logger.info("Accuracy: %.1f%%", errors.accuracy)
    _logger.info(
        "Median Error: %.1fdeg, %.1fcm", errors.median_rot_deg, errors.median_trans_cm
    )
    print(f"Accuracy: {errors.accuracy:.1f}%")
    print(f"Median Error: {errors.median_rot_deg:.1f}deg, {errors.median_trans_cm:.1f}cm")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
