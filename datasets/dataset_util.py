"""Shared helpers for the dataset setup scripts.

The ACE dataset layout (what all setup scripts produce, and what the
reconstruction CLI consumes) is a flat folder of
    <frame>.<jpg|png>          RGB frames
    <frame>_pose.txt           4x4 cam-to-world pose (optional, for eval/warm start)
    <frame>_depth.<png|npy>    metric depth (optional, seed initialization)
    focal_length.txt           single shared focal length (optional)
with correspondence by alphabetical order.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
from scipy.spatial.transform import Rotation


def mkdir(path: str | Path) -> Path:
    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    return p


def run(cmd: list[str], **kwargs) -> None:
    print("+", " ".join(str(c) for c in cmd), flush=True)
    subprocess.run([str(c) for c in cmd], check=True, **kwargs)


def download(url: str, target: str | Path) -> None:
    """wget fetch with resume; raises with a clear message offline."""
    try:
        run(["wget", "--continue", url, "-O", str(target)])
    except (subprocess.CalledProcessError, FileNotFoundError) as exc:
        raise RuntimeError(
            f"Could not download {url} — this environment appears to be "
            "offline. Fetch the archive manually and place it at "
            f"{target}, then re-run."
        ) from exc


def unpack(archive: str | Path, target_dir: str | Path) -> None:
    archive = str(archive)
    if archive.endswith(".zip"):
        run(["unzip", "-q", "-o", archive, "-d", str(target_dir)])
    else:
        run(["tar", "-xzf", archive, "-C", str(target_dir)])


def write_pose_txt(path: str | Path, pose_c2w: np.ndarray) -> None:
    np.savetxt(path, np.asarray(pose_c2w, np.float64), fmt="%.9f")


def quat_line_to_c2w(tokens: list[str]) -> tuple[np.ndarray, float | None]:
    """Parse `qw qx qy qz tx ty tz [f]` (world-to-camera) -> (c2w, focal)."""
    q = [float(t) for t in tokens[:4]]
    t = [float(x) for x in tokens[4:7]]
    focal = float(tokens[7]) if len(tokens) > 7 else None
    T = np.eye(4)
    T[:3, :3] = Rotation.from_quat([q[1], q[2], q[3], q[0]]).as_matrix()
    T[:3, 3] = t
    return np.linalg.inv(T), focal


def symlink_or_copy(src: str | Path, dst: str | Path) -> None:
    src, dst = Path(src), Path(dst)
    if dst.exists():
        return
    try:
        os.symlink(src.resolve(), dst)
    except OSError:
        import shutil

        shutil.copy(src, dst)


def progress(i: int, n: int, every: int = 200) -> None:
    if i % every == 0:
        print(f"  {i}/{n}", file=sys.stderr, flush=True)
