import json

import numpy as np
import pytest
from PIL import Image
from scipy.spatial.transform import Rotation

from acezero_tpu.export.cameras import export_camera_meshes
from acezero_tpu.export.nerf import export_transforms_json, opencv_to_opengl_c2w
from acezero_tpu.io.pose_files import PoseFileEntry, write_pose_file
from acezero_tpu.io.ply import write_ply_points


@pytest.fixture
def pose_scene(tmp_path, rng):
    files, entries = [], []
    for i in range(16):
        p = tmp_path / f"img_{i:03d}.png"
        Image.fromarray((rng.uniform(0, 255, (48, 64))).astype(np.uint8)).save(p)
        pose = np.eye(4)
        pose[:3, :3] = Rotation.random(random_state=np.random.RandomState(i)).as_matrix()
        pose[:3, 3] = rng.normal(size=3)
        conf = 2000.0 if i % 3 else 10.0  # some low-confidence frames
        entries.append(PoseFileEntry(str(p), pose, 500.0, conf))
        files.append(str(p))
    pose_file = tmp_path / "poses_final.txt"
    write_pose_file(pose_file, entries)
    return tmp_path, pose_file, entries


def test_transforms_json_structure(pose_scene):
    tmp_path, pose_file, entries = pose_scene
    out = export_transforms_json(pose_file, str(tmp_path / "*.png"), tmp_path / "nerf")
    with open(out) as f:
        t = json.load(f)

    assert len(t["frames"]) == 16
    # split: every 8th frame starting at 4 goes to test
    assert len(t["test_filenames"]) == 2
    # low-confidence frames dropped from train only
    assert all(
        f["confidence_score"] >= 1000
        for f in t["frames"]
        if f["file_path"] in set(t["train_filenames"])
    )
    frame = t["frames"][0]
    for key in ("fl_x", "fl_y", "cx", "cy", "w", "h", "k1", "transform_matrix"):
        assert key in frame
    assert frame["w"] == 64 and frame["h"] == 48


def test_opencv_to_opengl_roundtrip(rng):
    c2w = np.eye(4)
    c2w[:3, :3] = Rotation.random(random_state=np.random.RandomState(1)).as_matrix()
    c2w[:3, 3] = rng.normal(size=3)
    gl = opencv_to_opengl_c2w(c2w)
    # camera center unchanged; camera-frame y/z axes flipped
    np.testing.assert_allclose(gl[:3, 3], c2w[:3, 3])
    np.testing.assert_allclose(gl[:3, 0], c2w[:3, 0])
    np.testing.assert_allclose(gl[:3, 1], -c2w[:3, 1])
    np.testing.assert_allclose(gl[:3, 2], -c2w[:3, 2])


def test_transforms_json_with_split_file(pose_scene, tmp_path):
    scene_path, pose_file, entries = pose_scene
    files = sorted(e.rgb_file for e in entries)
    split = {"train_filenames": files[:12], "test_filenames": files[12:]}
    split_file = tmp_path / "split.json"
    with open(split_file, "w") as f:
        json.dump(split, f)
    out = export_transforms_json(
        pose_file, str(scene_path / "*.png"), tmp_path / "nerf2", split_file=split_file
    )
    with open(out) as f:
        t = json.load(f)
    assert set(t["test_filenames"]) == set(files[12:])


def test_transforms_json_attaches_point_cloud(pose_scene):
    tmp_path, pose_file, entries = pose_scene
    write_ply_points(tmp_path / "pc_final.ply", np.zeros((10, 3), np.float32))
    out = export_transforms_json(pose_file, str(tmp_path / "*.png"), tmp_path / "nerf3")
    with open(out) as f:
        t = json.load(f)
    assert t["ply_file_path"] == "pc_final.ply"
    assert (tmp_path / "nerf3" / "pc_final.ply").exists()


def test_camera_mesh_export(pose_scene):
    tmp_path, pose_file, entries = pose_scene
    out = tmp_path / "cams.ply"
    export_camera_meshes(out, entries)
    header = out.read_bytes()[:200].decode("ascii", errors="replace")
    assert "element vertex 80" in header  # 16 cameras x 5 vertices
    assert "element face 96" in header  # 16 x 6 faces
