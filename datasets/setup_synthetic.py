#!/usr/bin/env python3
"""Generate a synthetic demo dataset (textured room, exact GT poses/depth).

Unique to this framework: a hermetic dataset for trying the full pipeline
without downloads. Writes the standard ACE layout (frames, *_pose.txt,
*_depth.npy, focal_length.txt) that the reconstruction CLI consumes, plus a
ready-made reconstruction command.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from acezero_tpu.data.synthetic import render_scene  # noqa: E402
import dataset_util as dutil  # noqa: E402


def main() -> int:
    parser = argparse.ArgumentParser(description="Generate a synthetic demo scene.")
    parser.add_argument("--out", type=Path, default=Path("synthetic_room"))
    parser.add_argument("--views", type=int, default=60)
    parser.add_argument("--height", type=int, default=480)
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--look", choices=["outward", "across"], default="outward")
    args = parser.parse_args()

    dutil.mkdir(args.out)
    scene = render_scene(args.views, h=args.height, w=args.width, seed=args.seed, look=args.look)
    for i in range(args.views):
        stem = args.out / f"frame_{i:05d}"
        Image.fromarray(scene.images_u8[i]).save(f"{stem}.png")
        dutil.write_pose_txt(f"{stem}_pose.txt", scene.poses_c2w[i])
        np.save(f"{stem}_depth.npy", scene.depth[i])
    (args.out / "focal_length.txt").write_text(f"{scene.focal}\n")

    print(f"Wrote {args.views} views to {args.out}/ (focal {scene.focal:.1f})")
    print("Reconstruct with:")
    print(
        f"  ./ace_zero.py '{args.out}/*.png' results/synthetic "
        f"--depth_files '{args.out}/*_depth.npy' "
        f"--use_external_focal_length {scene.focal:.1f}"
    )
    print("Evaluate with:")
    print(f"  ./eval_poses.py results/synthetic/poses_final.txt '{args.out}/*_pose.txt'")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
