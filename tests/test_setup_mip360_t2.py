"""Offline fixture tests for the Mip-360 and Tanks&Temples setup code.

The real archives need network and pycolmap; here a stubbed pycolmap
reconstruction (known w2c poses + focals) exercises the COLMAP -> ACE
conversion (reference datasets/setup_mip360.py:37-120 semantics: per-frame
cam-to-world `*_pose.txt` + median `focal_length.txt`), and a mock zip
archive exercises the T2 unpack + convert flow
(reference datasets/setup_t2.py:28-120)."""

import sys
import types
import zipfile
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "datasets"))

from scipy.spatial.transform import Rotation  # noqa: E402


def _w2c(i: int) -> np.ndarray:
    T = np.eye(4)
    T[:3, :3] = Rotation.from_euler("xyz", [0.2 * i, 0.1, -0.03 * i]).as_matrix()
    T[:3, 3] = [0.5 * i, -0.1, 2.0]
    return T


class _FakeCamera:
    def __init__(self, f):
        self.focal_length = f


class _FakeImage:
    """pycolmap >= 0.4 interface: cam_from_world.matrix() -> (3, 4) w2c."""

    def __init__(self, name, w2c, camera_id):
        self.name = name
        self.camera_id = camera_id
        m = w2c[:3, :]
        self.cam_from_world = types.SimpleNamespace(matrix=lambda m=m: m)


class _FakeReconstruction:
    def __init__(self, path):
        self.path = path
        self.cameras = {1: _FakeCamera(480.0), 2: _FakeCamera(520.0)}
        self.images = {
            i: _FakeImage(f"img_{i:03d}.jpg", _w2c(i), camera_id=1 + i % 2)
            for i in range(3)
        }


@pytest.fixture()
def fake_pycolmap(monkeypatch):
    mod = types.ModuleType("pycolmap")
    mod.Reconstruction = _FakeReconstruction
    monkeypatch.setitem(sys.modules, "pycolmap", mod)
    return mod


def test_convert_colmap_scene_poses_and_focal(tmp_path, fake_pycolmap):
    import setup_mip360 as sm

    scene = tmp_path / "garden"
    (scene / "sparse" / "0").mkdir(parents=True)
    (scene / "images").mkdir()

    sm.convert_colmap_scene(scene)

    # per-frame c2w files: inverse of the stubbed w2c
    for i in range(3):
        pose = np.loadtxt(scene / "images" / f"img_{i:03d}_pose.txt")
        np.testing.assert_allclose(pose, np.linalg.inv(_w2c(i)), atol=1e-8)
    # median focal across the per-image cameras: [480, 520, 480] -> 480
    focal = float((scene / "images" / "focal_length.txt").read_text())
    assert focal == pytest.approx(480.0)


def test_convert_colmap_scene_requires_pycolmap(tmp_path, monkeypatch):
    import setup_mip360 as sm

    monkeypatch.setitem(sys.modules, "pycolmap", None)
    # Python treats a None entry in sys.modules as "import raises"
    with pytest.raises((RuntimeError, ImportError)):
        sm.convert_colmap_scene(tmp_path)


def test_t2_unpack_and_convert_flow(tmp_path, fake_pycolmap, monkeypatch):
    """Mock <Scene>.zip + <Scene>_COLMAP.zip; the script must unpack both and
    run the COLMAP conversion with images_subdir='.' (T2 layout keeps images
    at the scene root, reference setup_t2.py:85-120)."""
    import setup_t2 as st

    root = tmp_path / "t2"
    root.mkdir()
    # image archive: Barn/img_000.jpg ...
    with zipfile.ZipFile(root / "Barn.zip", "w") as z:
        for i in range(3):
            z.writestr(f"Barn/img_{i:03d}.jpg", b"notajpeg")
    # COLMAP ground-truth archive: sparse/0/ placeholder
    with zipfile.ZipFile(root / "Barn_COLMAP.zip", "w") as z:
        z.writestr("sparse/0/points3D.bin", b"")

    monkeypatch.setattr(
        sys, "argv", ["setup_t2.py", "--root", str(root), "--scenes", "Barn"]
    )
    assert st.main() == 0

    scene = root / "Barn"
    assert (scene / "sparse" / "0").is_dir()
    for i in range(3):
        pose = np.loadtxt(scene / f"img_{i:03d}_pose.txt")
        np.testing.assert_allclose(pose, np.linalg.inv(_w2c(i)), atol=1e-8)
    assert (scene / "focal_length.txt").exists()


def test_video_frame_extraction_needs_ffmpeg(tmp_path, monkeypatch):
    import setup_t2 as st

    monkeypatch.setattr("shutil.which", lambda _: None)
    with pytest.raises(RuntimeError, match="ffmpeg"):
        st.extract_video_frames(tmp_path / "x.mp4", tmp_path / "out")
