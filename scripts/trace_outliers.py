#!/usr/bin/env python3
"""Track per-frame pose error across the iterations of a finished run:
which frames are catastrophically wrong (>20cm after alignment), when they
first went bad, and whether high confidence accompanied the bad pose.
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
    thresh_cm = float(sys.argv[3]) if len(sys.argv) > 3 else 20.0

    from acezero_tpu.evalpose import evaluate_poses
    from acezero_tpu.io.pose_files import load_pose_files_glob, read_pose_file

    gt = load_pose_files_glob(str(scene_dir / "*_pose.txt"))

    pose_files = sorted(
        (p for p in run_dir.glob("poses_iteration*.txt")
         if "seed" not in p.name and "preliminary" not in p.name),
        key=lambda p: int(re.match(r"poses_iteration(\d+)", p.name).group(1)),
    )

    n = len(gt)
    rows = []  # (iteration, t_cm (n,), conf (n,))
    for pf in pose_files:
        it = int(re.match(r"poses_iteration(\d+)", pf.name).group(1))
        entries = read_pose_file(pf)
        if len(entries) != n:
            continue
        errors = evaluate_poses(entries, gt, alignment_conf_threshold=500)
        entries_sorted = sorted(entries, key=lambda e: e.rgb_file)
        conf = np.asarray([e.confidence for e in entries_sorted])
        rows.append((it, errors.trans_errors_cm, conf))

    # frames bad in the final iteration
    it_f, t_f, c_f = rows[-1]
    bad = np.where((t_f > thresh_cm) & (c_f >= 500))[0]
    print(f"final iteration {it_f}: {len(bad)} confident frames with t_err > {thresh_cm}cm")
    for k in bad:
        hist = " ".join(
            f"i{it}:{t[k]:7.1f}cm/c{c[k]:<6.0f}" for it, t, c in rows
        )
        print(f"  frame {k:3d}: {hist}")

    # also: frames that were ever bad-and-confident
    print("\nper-iteration count of confident-but-bad frames:")
    for it, t, c in rows:
        nb = int(np.sum((t > thresh_cm) & (c >= 500)))
        print(f"  iteration {it}: {nb} bad/confident of {int(np.sum(c >= 500))} confident")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
