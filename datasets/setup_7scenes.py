#!/usr/bin/env python3
"""Download and restructure the 7-Scenes dataset into the ACE layout.

Functional equivalent of /root/reference/datasets/setup_7scenes.py: fetches
the official Microsoft archives, optionally restructures into the flat ACE
layout (`7scenes_ace/<scene>/[train|test]/`), registers the Kinect depth
maps to the RGB sensor (depth sensor f=585 vs RGB f=525, fixed extrinsic
from the LIRIS Kinect calibration), and emits per-frame `*_pose.txt` files.
"""

from __future__ import annotations

import argparse
import concurrent.futures
from pathlib import Path

import numpy as np

import dataset_util as dutil

SCENES = ["chess", "fire", "heads", "office", "pumpkin", "redkitchen", "stairs"]
BASE_URL = "http://download.microsoft.com/download/2/8/5/28564B23-0828-408F-8631-23B1EFF1DAC8"

RGB_FOCAL = 525.0
DEPTH_FOCAL = 585.0
IMG_W, IMG_H = 640, 480

# depth -> RGB sensor extrinsic (LIRIS Kinect calibration; same constants the
# reference uses, setup_7scenes.py:29-36 — public calibration data)
D_TO_RGB = np.array(
    [
        [9.9996518012567637e-01, 2.6765126468950343e-03, -7.9041012313000904e-03, -2.5558943178152542e-02],
        [-2.7409311281316700e-03, 9.9996302803027592e-01, -8.1504520778013286e-03, 1.0109636268061706e-04],
        [7.8819942130445332e-03, 8.1718328771890631e-03, 9.9993554558014031e-01, 2.0318321729487039e-03],
        [0, 0, 0, 1],
    ]
)


def register_depth_to_rgb(depth_mm: np.ndarray) -> np.ndarray:
    """Reproject a depth map from the depth sensor into the RGB camera.

    Back-project with the depth intrinsics, transform by D_TO_RGB, forward
    project with the RGB intrinsics; z-buffer on collisions.
    """
    h, w = depth_mm.shape
    d = depth_mm.astype(np.float64) / 1000.0
    valid = (d > 0) & (d < 65.0)
    vv, uu = np.nonzero(valid)
    z = d[vv, uu]
    x = (uu + 0.5 - w / 2) / DEPTH_FOCAL * z
    y = (vv + 0.5 - h / 2) / DEPTH_FOCAL * z
    pts = np.stack([x, y, z, np.ones_like(z)], axis=0)
    pts = D_TO_RGB @ pts
    z_new = pts[2]
    u_new = np.round(RGB_FOCAL * pts[0] / z_new + w / 2 - 0.5).astype(int)
    v_new = np.round(RGB_FOCAL * pts[1] / z_new + h / 2 - 0.5).astype(int)
    ok = (u_new >= 0) & (u_new < w) & (v_new >= 0) & (v_new < h) & (z_new > 0)

    out = np.full((h, w), np.inf)
    np.minimum.at(out, (v_new[ok], u_new[ok]), z_new[ok])
    out[~np.isfinite(out)] = 0.0
    return (out * 1000.0).astype(np.uint16)


def setup_scene(scene: str, root: Path, ace_root: Path | None, depth_mode: str) -> None:
    from PIL import Image

    scene_dir = root / scene
    if not scene_dir.exists():
        archive = root / f"{scene}.zip"
        dutil.download(f"{BASE_URL}/{scene}.zip", archive)
        dutil.unpack(archive, root)
        # per-sequence zips inside
        for seq_zip in sorted(scene_dir.glob("*.zip")):
            dutil.unpack(seq_zip, scene_dir)

    if ace_root is None:
        return

    for split_name, split_file in [("train", "TrainSplit.txt"), ("test", "TestSplit.txt")]:
        split_seqs = [
            int(line.strip().replace("sequence", ""))
            for line in (scene_dir / split_file).read_text().splitlines()
            if line.strip()
        ]
        out_dir = dutil.mkdir(ace_root / scene / split_name)
        for seq in split_seqs:
            seq_dir = scene_dir / f"seq-{seq:02d}"
            for frame_file in sorted(seq_dir.glob("*.color.png")):
                stem = f"seq{seq:02d}-{frame_file.name.split('.')[0]}"
                dutil.symlink_or_copy(frame_file, out_dir / f"{stem}.png")
                pose = np.loadtxt(seq_dir / frame_file.name.replace(".color.png", ".pose.txt"))
                dutil.write_pose_txt(out_dir / f"{stem}_pose.txt", pose)
                if depth_mode == "calibrated":
                    depth_file = seq_dir / frame_file.name.replace(".color.png", ".depth.png")
                    depth = np.asarray(Image.open(depth_file))
                    depth = np.where(depth == 65535, 0, depth)
                    registered = register_depth_to_rgb(depth)
                    Image.fromarray(registered).save(out_dir / f"{stem}_depth.png")
        (out_dir / "focal_length.txt").write_text(f"{RGB_FOCAL}\n")


def main() -> int:
    parser = argparse.ArgumentParser(
        description="Download and setup the 7-Scenes dataset.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--scenes", nargs="*", default=SCENES)
    parser.add_argument("--setup_ace_structure", action="store_true",
                        help="restructure into the flat ACE layout in 7scenes_ace/")
    parser.add_argument("--depth", choices=["none", "calibrated"], default="none",
                        help="register original Kinect depth maps to the RGB sensor")
    parser.add_argument("--root", type=Path, default=Path("7scenes"))
    parser.add_argument("--workers", type=int, default=4)
    args = parser.parse_args()

    dutil.mkdir(args.root)
    ace_root = Path("7scenes_ace") if args.setup_ace_structure else None
    with concurrent.futures.ThreadPoolExecutor(args.workers) as ex:
        list(ex.map(lambda s: setup_scene(s, args.root, ace_root, args.depth), args.scenes))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
