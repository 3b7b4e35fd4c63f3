#!/usr/bin/env python3
"""Convert a folder of .mp4 videos into frame datasets (ffmpeg).

Equivalent of /root/reference/datasets/video_to_dataset.py: one
`video_<name>/` folder of high-quality JPEG frames per video, shortest side
scaled to --min_side_length.
"""

from __future__ import annotations

import argparse
import glob
import shutil
from pathlib import Path

import dataset_util as dutil


def main() -> int:
    parser = argparse.ArgumentParser(description="Convert .mp4 videos to frame datasets.")
    parser.add_argument("directory", type=str)
    parser.add_argument("--min_side_length", type=int, default=540)
    args = parser.parse_args()

    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        raise RuntimeError("ffmpeg not found on PATH.")

    for mp4 in sorted(glob.glob(str(Path(args.directory) / "*.mp4"))):
        out_dir = Path(args.directory) / f"video_{Path(mp4).stem}"
        if out_dir.exists():
            print(f"Folder already exists: {out_dir}. Skip.")
            continue
        dutil.mkdir(out_dir)
        dutil.run(
            [
                ffmpeg, "-i", mp4,
                "-vf",
                f"scale=w='if(lte(iw,ih),{args.min_side_length},-1)':"
                f"h='if(lte(iw,ih),-1,{args.min_side_length})'",
                "-qmin", "1", "-q:v", "1",
                f"{out_dir}/%06d.jpg",
            ]
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
