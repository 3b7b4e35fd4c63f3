"""Offline fixture tests for the 7-Scenes dataset setup code.

The real archives need network; here a 3-frame mock archive (tiny PNGs +
uint16 depth + 4x4 poses + split files) exercises the restructure, the
depth->RGB sensor registration, and all three pose sources — original,
calibrated (pose mapped to the RGB sensor), and PGT (external SfM poses +
per-frame focal). Mirrors /root/reference/datasets/setup_7scenes.py:210-315
and dataset_util.py:97-114 semantics.
"""

import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "datasets"))

import setup_7scenes as s7  # noqa: E402
from scipy.spatial.transform import Rotation  # noqa: E402

H, W = 32, 48


def _mock_pose(i: int) -> np.ndarray:
    T = np.eye(4)
    T[:3, :3] = Rotation.from_euler("xyz", [0.1 * i, -0.05 * i, 0.02]).as_matrix()
    T[:3, 3] = [0.1 * i, 0.2, 1.0 + 0.05 * i]
    return T


def _make_mock_archive(root: Path) -> Path:
    """root/chess with seq-01 (train: 2 frames) and seq-02 (test: 1 frame)."""
    scene = root / "chess"
    rng = np.random.default_rng(3)
    for seq, n in [(1, 2), (2, 1)]:
        d = scene / f"seq-{seq:02d}"
        d.mkdir(parents=True)
        for i in range(n):
            img = rng.integers(0, 255, (H, W), np.uint8)
            Image.fromarray(img).save(d / f"frame-{i:06d}.color.png")
            depth = np.full((H, W), 2000, np.uint16)  # flat 2 m plane
            depth[0, 0] = 65535  # invalid marker the loader must zero
            depth[1, 1] = 0
            Image.fromarray(depth).save(d / f"frame-{i:06d}.depth.png")
            np.savetxt(d / f"frame-{i:06d}.pose.txt", _mock_pose(seq * 10 + i))
    (scene / "TrainSplit.txt").write_text("sequence1\n")
    (scene / "TestSplit.txt").write_text("sequence2\n")
    return root


def _make_mock_pgt(root: Path, focal: float = 531.5) -> Path:
    """visloc-style pgt/sfm/7scenes/chess_{train,test}.txt files."""
    pgt = root / "pgt_sfm"
    (pgt / "7scenes").mkdir(parents=True)
    rng = np.random.default_rng(5)
    for split, frames in [("train", [("seq-01", 0), ("seq-01", 1)]), ("test", [("seq-02", 0)])]:
        lines = []
        for seq, i in frames:
            q = Rotation.from_euler("xyz", rng.uniform(-0.3, 0.3, 3)).as_quat()  # x,y,z,w
            t = rng.uniform(-1, 1, 3)
            lines.append(
                f"{seq}/frame-{i:06d}.color.png "
                f"{q[3]} {q[0]} {q[1]} {q[2]} {t[0]} {t[1]} {t[2]} {focal}"
            )
        (pgt / "7scenes" / f"chess_{split}.txt").write_text("\n".join(lines) + "\n")
    return pgt


@pytest.fixture()
def mock_root(tmp_path):
    return _make_mock_archive(tmp_path / "7scenes")


def test_register_depth_to_rgb_flat_plane():
    """A flat metric plane must survive the depth->RGB reprojection: same
    depth values (mm) wherever the reprojection lands, zeros elsewhere."""
    depth = np.full((H, W), 2000, np.uint16)
    out = s7.register_depth_to_rgb(depth)
    assert out.shape == (H, W) and out.dtype == np.uint16
    filled = out > 0
    assert filled.mean() > 0.5  # near-identity extrinsic: most cells land
    # the sensor offset is ~2.6 cm translation + <1 deg rotation: projected
    # depth of a flat plane changes by only a few mm
    assert np.all(np.abs(out[filled].astype(np.int64) - 2000) < 20)


def test_register_depth_zbuffer():
    """Two surfaces collapsing onto one RGB pixel must keep the nearer one."""
    depth = np.zeros((H, W), np.uint16)
    depth[10, 10] = 3000
    out_far = s7.register_depth_to_rgb(depth)
    depth[10, 10] = 1000
    out_near = s7.register_depth_to_rgb(depth)
    # both project somewhere; the near value is smaller wherever both landed
    both = (out_far > 0) & (out_near > 0)
    if both.any():
        assert out_near[both].min() <= out_far[both].min()


def test_setup_scene_calibrated(mock_root, tmp_path):
    ace = tmp_path / "ace"
    s7.setup_scene("chess", mock_root, ace, depth_mode="calibrated", pose_mode="calibrated")

    train = ace / "chess" / "train"
    test = ace / "chess" / "test"
    assert sorted(p.name for p in train.glob("*.png") if "depth" not in p.name) == [
        "seq01-frame-000000.png",
        "seq01-frame-000001.png",
    ]
    assert (test / "seq02-frame-000000.png").exists()
    assert float((train / "focal_length.txt").read_text()) == s7.RGB_FOCAL

    # calibrated poses = original @ inv(D_TO_RGB) (reference :181-187)
    got = np.loadtxt(train / "seq01-frame-000000_pose.txt")
    want = _mock_pose(10) @ np.linalg.inv(s7.D_TO_RGB)
    np.testing.assert_allclose(got, want, atol=1e-8)

    # registered depth: plane preserved, invalid markers dropped
    reg = np.asarray(Image.open(train / "seq01-frame-000000_depth.png"))
    assert reg.dtype == np.uint16
    filled = reg > 0
    assert filled.mean() > 0.5
    assert np.all(np.abs(reg[filled].astype(np.int64) - 2000) < 20)


def test_setup_scene_original_poses(mock_root, tmp_path):
    ace = tmp_path / "ace"
    s7.setup_scene("chess", mock_root, ace, depth_mode="none", pose_mode="original")
    got = np.loadtxt(ace / "chess" / "train" / "seq01-frame-000001_pose.txt")
    np.testing.assert_allclose(got, _mock_pose(11), atol=1e-9)
    assert not list((ace / "chess" / "train").glob("*_depth.png"))


def test_setup_scene_pgt(mock_root, tmp_path):
    focal = 531.5
    pgt = _make_mock_pgt(tmp_path, focal=focal)
    ace = tmp_path / "ace"
    s7.setup_scene(
        "chess", mock_root, ace, depth_mode="none", pose_mode="pgt", pgt_dir=pgt
    )
    train = ace / "chess" / "train"

    # pose = inv(w2c from the quat line) — c2w on disk
    table = s7._pgt_pose_table(pgt, "chess", "train")
    want, f = table["seq-01/frame-000000"]
    assert f == focal
    got = np.loadtxt(train / "seq01-frame-000000_pose.txt")
    np.testing.assert_allclose(got, want, atol=1e-8)

    # per-frame focal written; shared focal file too (all frames agree)
    assert float((train / "seq01-frame-000000_calibration.txt").read_text()) == focal
    assert float((train / "focal_length.txt").read_text()) == focal


def test_load_scene_per_frame_calibration(mock_root, tmp_path):
    """The reconstruction loader consumes the PGT layout's per-frame
    calibration files (alphabetical correspondence)."""
    focal = 531.5
    pgt = _make_mock_pgt(tmp_path, focal=focal)
    ace = tmp_path / "ace"
    s7.setup_scene(
        "chess", mock_root, ace, depth_mode="none", pose_mode="pgt", pgt_dir=pgt
    )
    train = ace / "chess" / "train"

    from acezero_tpu.data.scene import load_scene

    scene = load_scene(
        str(train / "*.png"),
        pose_files=str(train / "*_pose.txt"),
        calibration_files=str(train / "*_calibration.txt"),
        image_short_size=H,
    )
    assert len(scene) == 2
    np.testing.assert_allclose(scene.focals_orig, focal)

    with pytest.raises(FileNotFoundError):
        load_scene(
            str(train / "*.png"),
            calibration_files=str(train / "*nonexistent*.txt"),
            image_short_size=H,
        )
    # count mismatch (1 test calibration file vs 2 train rgb files)
    test_dir = ace / "chess" / "test"
    with pytest.raises(ValueError, match="calibration files"):
        load_scene(
            str(train / "*.png"),
            calibration_files=str(test_dir / "*_calibration.txt"),
            image_short_size=H,
        )
