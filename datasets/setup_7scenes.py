#!/usr/bin/env python3
"""Download and restructure the 7-Scenes dataset into the ACE layout.

Functional equivalent of /root/reference/datasets/setup_7scenes.py: fetches
the official Microsoft archives, optionally restructures into the flat ACE
layout (`7scenes_ace/<scene>/[train|test]/`), registers the Kinect depth
maps to the RGB sensor (depth sensor f=585 vs RGB f=525, fixed extrinsic
from the LIRIS Kinect calibration), and emits per-frame `*_pose.txt` files.

Pose sources (reference setup_7scenes.py:57-61):
  original   — raw poses of the depth sensor, linked as-is;
  calibrated — original poses mapped to the RGB sensor via the fixed
               depth->RGB extrinsic (pose @ inv(D_TO_RGB); reference
               setup_7scenes.py:181-187); the default;
  pgt        — SfM pseudo-ground-truth poses + per-frame focal lengths from
               the external visloc_pseudo_gt_limitations repository
               (Brachmann et al., ICCV 2021; reference dataset_util.py:97-114).
               Per-frame focals are written as `<frame>_calibration.txt`.
"""

from __future__ import annotations

import argparse
import concurrent.futures
from pathlib import Path

import numpy as np

import dataset_util as dutil

SCENES = ["chess", "fire", "heads", "office", "pumpkin", "redkitchen", "stairs"]
BASE_URL = "http://download.microsoft.com/download/2/8/5/28564B23-0828-408F-8631-23B1EFF1DAC8"
PGT_REPO_URL = "https://github.com/tsattler/visloc_pseudo_gt_limitations.git"

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


def register_depth_to_rgb(depth_mm: np.ndarray, rgb_focal: float = RGB_FOCAL) -> np.ndarray:
    """Reproject a depth map from the depth sensor into the RGB camera.

    Back-project with the depth intrinsics, transform by D_TO_RGB, forward
    project with the RGB intrinsics (per-frame focal when the PGT source
    provides one, reference setup_7scenes.py:215-220); z-buffer on
    collisions.
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
    u_new = np.round(rgb_focal * pts[0] / z_new + w / 2 - 0.5).astype(int)
    v_new = np.round(rgb_focal * pts[1] / z_new + h / 2 - 0.5).astype(int)
    ok = (u_new >= 0) & (u_new < w) & (v_new >= 0) & (v_new < h) & (z_new > 0)

    out = np.full((h, w), np.inf)
    np.minimum.at(out, (v_new[ok], u_new[ok]), z_new[ok])
    out[~np.isfinite(out)] = 0.0
    return (out * 1000.0).astype(np.uint16)


def _pgt_pose_table(pgt_dir: Path, scene: str, split_name: str) -> dict:
    """Per-frame `seq-XX/frame-XXXXXX -> (pose_c2w, focal)` from the external
    PGT repository's `7scenes/<scene>_<split>.txt` (one `file qw qx qy qz tx
    ty tz f` world-to-camera line per frame; reference dataset_util.py:32-71)."""
    pgt_file = pgt_dir / "7scenes" / f"{scene}_{split_name}.txt"
    table = {}
    for line in pgt_file.read_text().splitlines():
        tokens = line.split()
        if not tokens:
            continue
        name = tokens[0]
        # strip extension + modality: seq-01/frame-000000.color.png -> seq-01/frame-000000
        base = name.split(".")[0]
        c2w, focal = dutil.quat_line_to_c2w(tokens[1:])
        table[base] = (c2w, focal)
    return table


def ensure_pgt_repo(pgt_dir: Path | None) -> Path:
    """Resolve the external PGT pose repository, cloning it if needed."""
    target = pgt_dir if pgt_dir is not None else Path("visloc_pseudo_gt_limitations") / "pgt" / "sfm"
    if target.is_dir():
        return target
    clone_root = Path("visloc_pseudo_gt_limitations")
    try:
        dutil.run(["git", "clone", PGT_REPO_URL, str(clone_root)])
    except Exception as exc:  # noqa: BLE001
        raise RuntimeError(
            f"PGT pose files not found at {target} and cloning {PGT_REPO_URL} "
            "failed (offline?). Clone it manually and pass --pgt_dir "
            "<repo>/pgt/sfm."
        ) from exc
    return clone_root / "pgt" / "sfm"


def setup_scene(
    scene: str,
    root: Path,
    ace_root: Path | None,
    depth_mode: str,
    pose_mode: str = "calibrated",
    pgt_dir: Path | None = None,
) -> None:
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

    d_to_rgb_inv = np.linalg.inv(D_TO_RGB)

    for split_name, split_file in [("train", "TrainSplit.txt"), ("test", "TestSplit.txt")]:
        split_seqs = [
            int(line.strip().replace("sequence", ""))
            for line in (scene_dir / split_file).read_text().splitlines()
            if line.strip()
        ]
        out_dir = dutil.mkdir(ace_root / scene / split_name)
        pgt_poses = (
            _pgt_pose_table(pgt_dir, scene, split_name) if pose_mode == "pgt" else None
        )
        shared_focals: list[float] = []
        for seq in split_seqs:
            seq_dir = scene_dir / f"seq-{seq:02d}"
            for frame_file in sorted(seq_dir.glob("*.color.png")):
                base = frame_file.name.split(".")[0]  # frame-XXXXXX
                stem = f"seq{seq:02d}-{base}"
                dutil.symlink_or_copy(frame_file, out_dir / f"{stem}.png")

                rgb_focal = RGB_FOCAL
                if pose_mode == "original":
                    # raw depth-sensor pose, linked as-is
                    pose = np.loadtxt(seq_dir / f"{base}.pose.txt")
                elif pose_mode == "pgt":
                    pose, pgt_focal = pgt_poses[f"seq-{seq:02d}/{base}"]
                    if pgt_focal is not None:
                        rgb_focal = pgt_focal
                        # per-frame focal from the SfM PGT
                        (out_dir / f"{stem}_calibration.txt").write_text(f"{rgb_focal}\n")
                else:  # calibrated: register the pose to the RGB sensor
                    pose = np.loadtxt(seq_dir / f"{base}.pose.txt") @ d_to_rgb_inv
                dutil.write_pose_txt(out_dir / f"{stem}_pose.txt", pose)
                shared_focals.append(rgb_focal)

                if depth_mode == "calibrated":
                    depth_file = seq_dir / f"{base}.depth.png"
                    depth = np.asarray(Image.open(depth_file))
                    depth = np.where(depth == 65535, 0, depth)
                    registered = register_depth_to_rgb(depth, rgb_focal=rgb_focal)
                    Image.fromarray(registered).save(out_dir / f"{stem}_depth.png")
        # one shared focal file when the scene actually shares one (always
        # for original/calibrated; PGT focals are per-frame but constant
        # within a scene in practice)
        if shared_focals and np.allclose(shared_focals, shared_focals[0]):
            (out_dir / "focal_length.txt").write_text(f"{shared_focals[0]}\n")


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
    parser.add_argument("--poses", choices=["original", "calibrated", "pgt"],
                        default="calibrated",
                        help="original: raw depth-sensor poses; calibrated: "
                             "poses mapped to the RGB sensor; pgt: external "
                             "SfM pseudo-GT poses + per-frame focals")
    parser.add_argument("--pgt_dir", type=Path, default=None,
                        help="local path to visloc_pseudo_gt_limitations/pgt/sfm "
                             "(cloned automatically when omitted and online)")
    parser.add_argument("--root", type=Path, default=Path("7scenes"))
    parser.add_argument("--workers", type=int, default=4)
    args = parser.parse_args()

    pgt_dir = ensure_pgt_repo(args.pgt_dir) if args.poses == "pgt" else None
    dutil.mkdir(args.root)
    ace_root = Path("7scenes_ace") if args.setup_ace_structure else None
    with concurrent.futures.ThreadPoolExecutor(args.workers) as ex:
        list(
            ex.map(
                lambda s: setup_scene(
                    s, args.root, ace_root, args.depth, args.poses, pgt_dir
                ),
                args.scenes,
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
