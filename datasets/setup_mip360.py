#!/usr/bin/env python3
"""Download Mip-NeRF 360 and convert the COLMAP ground truth to ACE layout.

Functional equivalent of /root/reference/datasets/setup_mip360.py: fetches
the official archive, then for each scene reads the COLMAP sparse
reconstruction via pycolmap and writes per-frame `*_pose.txt` (cam-to-world)
plus `focal_length.txt` next to the images.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

import dataset_util as dutil

URL = "http://storage.googleapis.com/gresearch/refraw360/360_v2.zip"
SCENES = ["bicycle", "bonsai", "counter", "garden", "kitchen", "room", "stump"]


def convert_colmap_scene(scene_dir: Path, images_subdir: str = "images") -> None:
    try:
        import pycolmap
    except ImportError as exc:
        raise RuntimeError(
            "pycolmap is required to convert COLMAP ground truth. Install it "
            "(pip install pycolmap) or provide *_pose.txt files directly."
        ) from exc

    recon = pycolmap.Reconstruction(str(scene_dir / "sparse" / "0"))
    images_dir = scene_dir / images_subdir

    focals = []
    for image in recon.images.values():
        cam = recon.cameras[image.camera_id]
        focals.append(float(cam.focal_length))
        # COLMAP stores world-to-camera; emit cam-to-world
        w2c = np.eye(4)
        try:
            w2c[:3, :] = image.cam_from_world.matrix()  # pycolmap >= 0.4
        except AttributeError:
            w2c[:3, :3] = image.rotation_matrix()
            w2c[:3, 3] = image.tvec
        c2w = np.linalg.inv(w2c)
        stem = Path(image.name).stem
        dutil.write_pose_txt(images_dir / f"{stem}_pose.txt", c2w)

    (images_dir / "focal_length.txt").write_text(f"{np.median(focals)}\n")
    print(f"{scene_dir.name}: {len(recon.images)} poses, focal {np.median(focals):.1f}")


def main() -> int:
    parser = argparse.ArgumentParser(
        description="Download and setup the Mip-NeRF 360 dataset.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--root", type=Path, default=Path("mip360"))
    parser.add_argument("--scenes", nargs="*", default=SCENES)
    parser.add_argument("--images_subdir", default="images",
                        help="images / images_2 / images_4 / images_8 resolution variant")
    args = parser.parse_args()

    dutil.mkdir(args.root)
    archive = args.root / "360_v2.zip"
    if not any((args.root / s).exists() for s in args.scenes):
        dutil.download(URL, archive)
        dutil.unpack(archive, args.root)

    for scene in args.scenes:
        convert_colmap_scene(args.root / scene, args.images_subdir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
