"""ACE pose-file I/O — byte-compatible with the reference text formats.

The 10-token-per-line pose file is simultaneously the reference's checkpoint,
IPC, dataset, and output format (/root/reference/dataset_io.py:96-186):

    rgb_file qw qx qy qz tx ty tz focal_length confidence

with the pose stored **world-to-camera**. This module keeps that contract
(poses_final.txt must stay drop-in compatible) while the in-process pipeline
passes device arrays around instead of files.
"""

from __future__ import annotations

import glob as _glob
import math
from dataclasses import dataclass
from pathlib import Path
from typing import Iterable, Sequence

import numpy as np
from scipy.spatial.transform import Rotation


@dataclass
class PoseFileEntry:
    """One line of an ACE pose file."""

    rgb_file: str
    pose_w2c: np.ndarray  # (4, 4)
    focal_length: float
    confidence: float

    @property
    def pose_c2w(self) -> np.ndarray:
        return np.linalg.inv(self.pose_w2c)


def format_pose_line(
    rgb_file: str, pose_w2c: np.ndarray, focal_length: float, confidence: float
) -> str:
    """Format one pose-file line exactly like the reference writer.

    The reference (dataset_io.py:159-186) prints raw Python floats from a
    scipy quaternion (x, y, z, w order reordered to w first) and the
    translation column of the world-to-camera matrix.
    """
    pose = np.asarray(pose_w2c, dtype=np.float64)
    q_xyzw = Rotation.from_matrix(pose[:3, :3]).as_quat()
    t = pose[:3, 3]
    return (
        f"{rgb_file} "
        f"{q_xyzw[3]} {q_xyzw[0]} {q_xyzw[1]} {q_xyzw[2]} "
        f"{t[0]} {t[1]} {t[2]} {focal_length} {confidence}\n"
    )


def write_pose_file(
    path: str | Path,
    entries: Iterable[PoseFileEntry],
) -> None:
    with open(path, "w") as f:
        for e in entries:
            f.write(format_pose_line(e.rgb_file, e.pose_w2c, e.focal_length, e.confidence))


def read_pose_file(
    path: str | Path, confidence_threshold: float | None = None
) -> list[PoseFileEntry]:
    """Parse an ACE pose file; optionally drop low-confidence entries.

    Mirrors /root/reference/dataset_io.py:96-156 (10 tokens per line asserted,
    quaternion is (w, x, y, z), pose is world-to-camera).
    """
    entries: list[PoseFileEntry] = []
    with open(path, "r") as f:
        for line in f:
            tokens = line.split()
            if not tokens:
                continue
            if len(tokens) != 10:
                raise ValueError(
                    f"Expected 10 tokens per pose-file line, got {len(tokens)}: {line!r}"
                )
            confidence = float(tokens[9])
            if confidence_threshold is not None and confidence < confidence_threshold:
                continue
            q_wxyz = [float(t) for t in tokens[1:5]]
            t_xyz = [float(t) for t in tokens[5:8]]
            R = Rotation.from_quat(q_wxyz[1:] + [q_wxyz[0]]).as_matrix()
            pose = np.eye(4)
            pose[:3, :3] = R
            pose[:3, 3] = t_xyz
            entries.append(
                PoseFileEntry(
                    rgb_file=tokens[0],
                    pose_w2c=pose,
                    focal_length=float(tokens[8]),
                    confidence=confidence,
                )
            )
    return entries


def load_pose_matrix(path: str | Path) -> np.ndarray:
    """Load a single 4x4 pose matrix text file (cam-to-world by convention)."""
    pose = np.loadtxt(path).astype(np.float64)
    if pose.shape != (4, 4):
        raise ValueError(f"Expected 4x4 pose in {path}, got shape {pose.shape}")
    return pose


def load_pose_files_glob(pattern: str) -> list[np.ndarray]:
    """Load all 4x4 pose files matching a glob, sorted alphabetically."""
    return [load_pose_matrix(p) for p in sorted(_glob.glob(pattern))]


def load_focal_length(path: str | Path) -> float:
    """Load a focal length from a calibration file.

    Accepts either a single scalar or a full 3x3 K matrix (focal taken from
    K[0, 0]), mirroring /root/reference/dataset_io.py:26-44.
    """
    data = np.loadtxt(path)
    if data.size > 1:
        return float(np.atleast_2d(data)[0, 0])
    return float(data)


def get_files_from_glob(pattern: str) -> list[str]:
    """Resolve a glob pattern into a sorted file list (alphabetical order is
    the correspondence rule everywhere in this pipeline)."""
    files = sorted(_glob.glob(pattern))
    if not files:
        raise FileNotFoundError(f"No files found for glob pattern: {pattern}")
    return files


def is_pose_valid(pose: np.ndarray) -> bool:
    return bool(np.isfinite(pose).all())


def registration_rates(
    confidences: Sequence[float] | np.ndarray, thresholds: Sequence[float]
) -> list[float]:
    """Fraction of entries with confidence strictly above each threshold
    (reference ace_zero_util.py:160-185)."""
    conf = np.asarray(confidences, dtype=np.float64)
    if conf.size == 0:
        return [math.nan for _ in thresholds]
    return [float((conf > t).sum() / conf.size) for t in thresholds]
