#!/usr/bin/env python3
"""Create benchmark split JSON files for Mip-NeRF 360 scenes.

Equivalent of /root/reference/scripts/create_splits_mip360.py: every 8th
frame (alphabetical order, offset 4) becomes the test set.
"""

from __future__ import annotations

import argparse
import glob
import json
from pathlib import Path


def main() -> int:
    parser = argparse.ArgumentParser(description="Create Mip-360 benchmark splits.")
    parser.add_argument("dataset_root", type=Path)
    parser.add_argument("output_folder", type=Path)
    parser.add_argument("--images_subdir", default="images")
    parser.add_argument("--interval", type=int, default=8)
    args = parser.parse_args()

    args.output_folder.mkdir(parents=True, exist_ok=True)
    for scene_folder in sorted(p for p in args.dataset_root.glob("*/") if p.is_dir()):
        files = sorted(
            f
            for ext in ("JPG", "jpg", "png")
            for f in glob.glob(str(scene_folder / args.images_subdir / f"*.{ext}"))
        )
        if not files:
            continue
        test_idx = set(range(args.interval // 2, len(files), args.interval))
        split = {
            "train_filenames": [f for i, f in enumerate(files) if i not in test_idx],
            "test_filenames": [f for i, f in enumerate(files) if i in test_idx],
        }
        out = args.output_folder / f"mip360_{scene_folder.name}.json"
        with open(out, "w") as f:
            json.dump(split, f)
        print(f"{out}: {len(split['train_filenames'])} train / {len(split['test_filenames'])} test")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
