"""Smoke test of the render_final_sweep CLI on synthetic pipeline artifacts."""

import sys
from pathlib import Path

import numpy as np
from scipy.spatial.transform import Rotation

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from acezero_tpu.io.pose_files import PoseFileEntry, write_pose_file
from acezero_tpu.viz import ReconstructionVisualizer, VizConfig


def test_render_final_sweep_cli(tmp_path, rng):
    out = tmp_path / "results"
    render_path = out / "renderings"
    render_path.mkdir(parents=True)

    entries = []
    for i in range(6):
        pose = np.eye(4)
        pose[:3, :3] = Rotation.random(random_state=np.random.RandomState(i)).as_matrix()
        pose[:3, 3] = rng.normal(size=3)
        entries.append(PoseFileEntry(f"f{i:02d}.png", pose, 500.0, 800.0 if i % 2 else 100.0))
    write_pose_file(out / "poses_iteration1.txt", entries)
    write_pose_file(out / "poses_iteration2.txt", entries)

    viz = ReconstructionVisualizer(VizConfig(target_path=render_path, frame_h=90, frame_w=120))
    viz.update_point_cloud(rng.normal(size=(200, 3)).astype(np.float32),
                           np.full((200, 3), 128, np.uint8))
    viz.save_state(render_path / "iteration2_register.pkl")

    from render_final_sweep import main

    rc = main([str(render_path), "--num_frames", "3"])
    assert rc == 0
    frames = list(render_path.glob("frame_*.png"))
    assert len(frames) == 3
