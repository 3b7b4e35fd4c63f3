#!/usr/bin/env python3
"""Setup Tanks & Temples (training set) in the ACE layout.

Functional equivalent of /root/reference/datasets/setup_t2.py: unpacks the
per-scene archives (image sets + COLMAP ground truth must be downloaded
manually from tanksandtemples.org — the official host requires a form),
extracts 540p frames from the scene videos with ffmpeg, and exports COLMAP
poses + `focal_length.txt` via the same converter as Mip-360.
"""

from __future__ import annotations

import argparse
import shutil
from pathlib import Path

import dataset_util as dutil
from setup_mip360 import convert_colmap_scene

TRAINING_SCENES = [
    "Barn", "Caterpillar", "Church", "Courthouse", "Ignatius", "Meetingroom", "Truck",
]


def extract_video_frames(video: Path, out_dir: Path, min_side: int = 540) -> None:
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        raise RuntimeError("ffmpeg not found on PATH; needed for frame extraction.")
    dutil.mkdir(out_dir)
    dutil.run(
        [
            ffmpeg, "-i", str(video),
            "-vf",
            f"scale=w='if(lte(iw,ih),{min_side},-1)':h='if(lte(iw,ih),-1,{min_side})'",
            "-qmin", "1", "-q:v", "1",
            f"{out_dir}/%06d.jpg",
        ]
    )


def main() -> int:
    parser = argparse.ArgumentParser(
        description="Setup the Tanks and Temples training scenes.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--root", type=Path, default=Path("t2"),
                        help="folder containing the downloaded <Scene>.zip image archives, "
                             "<Scene>.mp4 videos and <Scene>_COLMAP.zip ground truth")
    parser.add_argument("--scenes", nargs="*", default=TRAINING_SCENES)
    parser.add_argument("--video_frames", action="store_true",
                        help="also extract 540p frames from the scene videos")
    args = parser.parse_args()

    for scene in args.scenes:
        scene_dir = args.root / scene
        archive = args.root / f"{scene}.zip"
        if not scene_dir.exists() and archive.exists():
            dutil.unpack(archive, args.root)

        colmap_zip = args.root / f"{scene}_COLMAP.zip"
        if colmap_zip.exists() and not (scene_dir / "sparse").exists():
            dutil.unpack(colmap_zip, scene_dir)

        if (scene_dir / "sparse").exists():
            convert_colmap_scene(scene_dir, images_subdir=".")

        video = args.root / f"{scene}.mp4"
        if args.video_frames and video.exists():
            extract_video_frames(video, args.root / f"video_{scene}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
