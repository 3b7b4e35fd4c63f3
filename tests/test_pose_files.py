import numpy as np
from scipy.spatial.transform import Rotation

from acezero_tpu.io import (
    PoseFileEntry,
    read_pose_file,
    registration_rates,
    write_pose_file,
)


def _entry(rng, name, conf):
    pose = np.eye(4)
    pose[:3, :3] = Rotation.random(random_state=np.random.RandomState(11)).as_matrix()
    pose[:3, 3] = rng.normal(size=3)
    return PoseFileEntry(rgb_file=name, pose_w2c=pose, focal_length=525.0, confidence=conf)


def test_pose_file_roundtrip(tmp_path, rng):
    entries = [_entry(rng, f"img_{i:03d}.jpg", 100.0 * i) for i in range(5)]
    path = tmp_path / "poses.txt"
    write_pose_file(path, entries)

    back = read_pose_file(path)
    assert len(back) == 5
    for a, b in zip(entries, back):
        assert a.rgb_file == b.rgb_file
        np.testing.assert_allclose(a.pose_w2c, b.pose_w2c, atol=1e-9)
        assert a.focal_length == b.focal_length
        assert a.confidence == b.confidence


def test_pose_file_format_is_reference_compatible(tmp_path, rng):
    """Each line must have exactly 10 whitespace tokens, quat first (wxyz)."""
    entries = [_entry(rng, "a.jpg", 1234.0)]
    path = tmp_path / "poses.txt"
    write_pose_file(path, entries)
    line = path.read_text().strip()
    tokens = line.split()
    assert len(tokens) == 10
    assert tokens[0] == "a.jpg"
    q = np.array([float(t) for t in tokens[1:5]])
    np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-6)
    assert float(tokens[8]) == 525.0
    assert float(tokens[9]) == 1234.0


def test_confidence_filter(tmp_path, rng):
    entries = [_entry(rng, f"{i}.jpg", float(i)) for i in range(10)]
    path = tmp_path / "poses.txt"
    write_pose_file(path, entries)
    kept = read_pose_file(path, confidence_threshold=5.0)
    assert len(kept) == 5  # reference keeps conf >= threshold? it drops conf < t
    assert all(e.confidence >= 5.0 for e in kept)


def test_registration_rates():
    conf = [0, 600, 1500, 2500, 5000]
    rates = registration_rates(conf, [500, 1000, 2000, 4000])
    assert rates == [4 / 5, 3 / 5, 2 / 5, 1 / 5]


def test_infinite_confidence_roundtrip(tmp_path, rng):
    # preliminary pose files use confidence=inf (reference ace_trainer.py:714)
    e = _entry(rng, "x.jpg", float("inf"))
    path = tmp_path / "p.txt"
    write_pose_file(path, [e])
    back = read_pose_file(path, confidence_threshold=1000)
    assert len(back) == 1 and back[0].confidence == float("inf")
