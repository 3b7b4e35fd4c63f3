"""Control-flow tests for the pipeline's loop-closure exits (mocked).

The expensive pieces (mapping, registration, the loop-closure measurement)
are monkeypatched so these tests pin down the ORCHESTRATION semantics:

- probe memo: a strongly drift-free probe suppresses the post-refit
  re-measurement while registration holds;
- final consistency choice: when corrections were applied during the run
  and the final measurement still detects drift, the corrected pose graph
  becomes the final estimate; a converged (no-drift-break) run keeps the
  registration poses.
"""

import numpy as np
import pytest
from PIL import Image

from synthetic import render_room_scene

from acezero_tpu.io.pose_files import read_pose_file
from acezero_tpu.reconstruct import AceZeroConfig, AceZeroPipeline


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("lcflow_scene")
    data = render_room_scene(8, h=96, w=128)
    for i in range(8):
        Image.fromarray(data["images_u8"][i]).save(out / f"frame_{i:03d}.png")
        np.save(out / f"frame_{i:03d}_depth.npy", data["depth"][i])
    return out, data


def _cfg(scene_path, data, out_dir):
    return AceZeroConfig(
        rgb_files=str(scene_path / "*.png"),
        results_folder=out_dir,
        depth_files=str(scene_path / "*_depth.npy"),
        use_external_focal_length=data["focal"],
        try_seeds=1,
        seed_iterations=20,
        iterations=20,
        iterations_max=3,
        learning_rate_schedule="constant",
        learning_rate_min=0.003,
        max_training_buffer_size=1024,
        samples_per_image=128,
        max_dataset_passes=1,
        batch_size=128,
        chunk_steps=10,
        num_head_blocks=0,
        ransac_iterations=8,
        registration_confidence=0,  # every frame counts as registered
        registration_frame_chunk=8,
        refinement_steps=2,
        loop_closure=True,
        loopclose_final_graph=True,  # the flow under test (default off)
        adaptive_refit_max_cycles=1,
        refit_iterations=20,
        final_refit_posewait=0,
    )


def _run_with_fake_lc(pipeline, drift_schedule):
    """Run the pipeline with _loop_close replaced by a scripted fake.

    drift_schedule: list of bools consumed per _loop_close call — True means
    'drift detected, corrections applied' (entries get a translation bump so
    the output records which pose set won).
    """
    calls = {"n": 0}

    def fake_loop_close(entries, head_params, focal_estimate):
        i = min(calls["n"], len(drift_schedule) - 1)
        drift = drift_schedule[i]
        calls["n"] += 1
        if not drift:
            return entries, {"skipped": "probe_no_drift", "median_corr_t": 0.0}
        corrected = []
        from acezero_tpu.io.pose_files import PoseFileEntry

        for e in entries:
            pose = e.pose_w2c.copy()
            pose[0, 3] += 1000.0  # unmistakable marker
            corrected.append(
                PoseFileEntry(e.rgb_file, pose, e.focal_length, e.confidence)
            )
        return corrected, {"median_corr_t": 1.0, "median_corr_rot_deg": 2.0,
                           "scene_diag": 1.0}

    pipeline._loop_close = fake_loop_close
    result = pipeline.run()
    return result, calls["n"]


@pytest.mark.slow
def test_no_drift_keeps_registration_poses(scene_dir, tmp_path):
    scene_path, data = scene_dir
    pipeline = AceZeroPipeline(_cfg(scene_path, data, tmp_path / "out_nd"))
    result, n_calls = _run_with_fake_lc(pipeline, [False, False, False])
    entries = read_pose_file(tmp_path / "out_nd" / "poses_final.txt")
    assert all(abs(e.pose_w2c[0, 3]) < 100 for e in entries)
    # no drift ever detected -> no extra cycles, no final re-measure
    assert result["iterations"] <= 3


def test_unconverged_drift_outputs_corrected_graph(scene_dir, tmp_path):
    scene_path, data = scene_dir
    pipeline = AceZeroPipeline(_cfg(scene_path, data, tmp_path / "out_dr"))
    # every measurement detects drift: the adaptive cycle caps out and the
    # final consistency choice must emit the corrected graph
    result, n_calls = _run_with_fake_lc(pipeline, [True, True, True, True])
    out = tmp_path / "out_dr"
    entries = read_pose_file(out / "poses_final.txt")
    assert all(e.pose_w2c[0, 3] > 900 for e in entries), (
        "final poses must be the loop-closure-corrected graph"
    )
    assert list(out.glob("poses_iteration*_loopclosed.txt"))


@pytest.mark.slow
def test_converged_drift_keeps_registration_poses(scene_dir, tmp_path):
    scene_path, data = scene_dir
    pipeline = AceZeroPipeline(_cfg(scene_path, data, tmp_path / "out_cv"))
    # drift on the first measurement (one corrective cycle), then converged:
    # the no-drift break must NOT trigger the final consistency choice (the
    # +1000 correction marker legitimately propagates into the refit map and
    # its registration, so assert on the mechanism's artifact instead)
    result, n_calls = _run_with_fake_lc(pipeline, [True, False])
    out = tmp_path / "out_cv"
    assert not list(out.glob("poses_iteration*_loopclosed.txt"))
    # the run still ran the corrective refit cycle before converging
    assert (out / "poses_final.txt").exists()
