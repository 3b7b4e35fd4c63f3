#!/usr/bin/env python3
"""Drift diagnostic: evaluate every per-iteration pose file of a finished
reconstruction run against GT, and break errors down by frame (ring
position) to show where and when drift enters.

Usage:
  python scripts/diagnose_drift.py results/heldout/chesslike_a_run0 \
      results/heldout/scenes/chesslike_a
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> int:
    run_dir = Path(sys.argv[1])
    scene_dir = Path(sys.argv[2])

    from acezero_tpu.evalpose import evaluate_poses
    from acezero_tpu.io.pose_files import load_pose_files_glob, read_pose_file

    gt = load_pose_files_glob(str(scene_dir / "*_pose.txt"))

    pose_files = sorted(
        run_dir.glob("poses_iteration*.txt"),
        key=lambda p: (
            int(re.match(r"poses_iteration(\d+)", p.name).group(1)),
            "preliminary" in p.name,
        ),
    )
    pose_files = [p for p in pose_files if "seed" not in p.name]

    print(f"{'file':44s} {'acc5/5':>7s} {'med_r':>7s} {'med_t':>8s} {'n_reg':>6s}")
    per_frame_errs = {}
    for pf in pose_files:
        entries = read_pose_file(pf)
        try:
            errors = evaluate_poses(entries, gt, alignment_conf_threshold=500)
        except Exception as exc:  # noqa: BLE001
            print(f"{pf.name:44s}  eval failed: {exc}")
            continue
        n_reg = sum(1 for e in entries if e.confidence >= 500)
        print(
            f"{pf.name:44s} {errors.accuracy:6.1f}% {errors.median_rot_deg:6.2f}d "
            f"{errors.median_trans_cm:7.1f}c {n_reg:6d}"
        )
        per_frame_errs[pf.name] = errors

    # per-frame breakdown of the final file: error vs ring index
    final = per_frame_errs.get("poses_final.txt")
    if (run_dir / "poses_final.txt").exists():
        entries = read_pose_file(run_dir / "poses_final.txt")
        errors = evaluate_poses(entries, gt, alignment_conf_threshold=500)
        if hasattr(errors, "rot_errors_deg"):
            print("\nper-frame errors (poses_final.txt), by filename order:")
            # error arrays are in filename-sorted order (evaluate_poses sorts)
            entries_sorted = sorted(entries, key=lambda e: e.rgb_file)
            for k, e in enumerate(entries_sorted):
                r = errors.rot_errors_deg[k]
                t = errors.trans_errors_cm[k]
                bar = "#" * min(60, int(t))
                print(f"  {Path(e.rgb_file).name:22s} conf={e.confidence:7.0f} "
                      f"r={r:6.2f}d t={t:7.1f}cm {bar}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
