#!/usr/bin/env python3
"""Create benchmark train/test split JSON files for 7-Scenes.

Equivalent of /root/reference/scripts/create_splits_7scenes.py: the official
TrainSplit/TestSplit sequence lists of each scene become
`7scenes_<scene>.json` files with `train_filenames`/`test_filenames` for the
view-synthesis benchmark's `--split_json`.
"""

from __future__ import annotations

import argparse
import glob
import json
from pathlib import Path


def files_for_split(scene_folder: Path, split_file: str) -> list[str]:
    seqs = []
    for line in (scene_folder / split_file).read_text().splitlines():
        line = line.strip()
        if line:
            seqs.append(int(line.replace("sequence", "")))
    out: list[str] = []
    for seq in seqs:
        out += sorted(glob.glob(str(scene_folder / f"seq-{seq:02d}" / "*.color.png")))
    return out


def main() -> int:
    parser = argparse.ArgumentParser(description="Create 7-Scenes benchmark splits.")
    parser.add_argument("dataset_root", type=Path)
    parser.add_argument("output_folder", type=Path)
    args = parser.parse_args()

    args.output_folder.mkdir(parents=True, exist_ok=True)
    for scene_folder in sorted(p for p in args.dataset_root.glob("*/") if p.is_dir()):
        split = {
            "train_filenames": files_for_split(scene_folder, "TrainSplit.txt"),
            "test_filenames": files_for_split(scene_folder, "TestSplit.txt"),
        }
        out = args.output_folder / f"7scenes_{scene_folder.name}.json"
        with open(out, "w") as f:
            json.dump(split, f)
        print(f"{out}: {len(split['train_filenames'])} train / {len(split['test_filenames'])} test")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
