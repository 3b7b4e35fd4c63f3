"""Warm-start / seed-network reconstruction path, end to end.

The T2-training-videos recipe shape (reference
scripts/reconstruct_t2_training_videos_warmstart.sh:52-66 +
ace_zero.py:175-177): map a POSED subset of the frames first, then seed a
fresh ACE0 reconstruction of the full scene with that network via
`--seed_network` — the seed stage is skipped entirely and the loop starts by
registering everything against the warm map.
"""

import jax
import numpy as np
import pytest
from PIL import Image

from synthetic import render_room_scene

from acezero_tpu.io.pose_files import read_pose_file
from acezero_tpu.models import torch_io
from acezero_tpu.models.head import HeadConfig
from acezero_tpu.reconstruct import AceZeroConfig, AceZeroPipeline


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("warm_scene")
    data = render_room_scene(10, h=96, w=128)
    for i in range(10):
        Image.fromarray(data["images_u8"][i]).save(out / f"frame_{i:03d}.png")
        np.save(out / f"frame_{i:03d}_depth.npy", data["depth"][i])
        np.savetxt(out / f"frame_{i:03d}_pose.txt", data["poses_c2w"][i])
    return out, data


def _mini_cfg(scene_path, data, out_dir, **overrides):
    kw = dict(
        rgb_files=str(scene_path / "*.png"),
        results_folder=out_dir,
        use_external_focal_length=data["focal"],
        iterations=30,
        iterations_max=2,
        learning_rate_schedule="constant",
        learning_rate_min=0.003,
        max_training_buffer_size=2048,
        samples_per_image=128,
        max_dataset_passes=2,
        batch_size=128,
        chunk_steps=10,
        num_head_blocks=0,
        ransac_iterations=8,
        registration_confidence=5,
        registration_frame_chunk=8,
        refinement_steps=2,
        final_refine=False,
        final_refit=False,
        loop_closure=False,
    )
    kw.update(overrides)
    return AceZeroConfig(**kw)


def test_seed_network_skips_seed_stage(scene_dir, tmp_path):
    scene_path, data = scene_dir

    # ---- stage 1: map a posed 6-frame subset (the reference's train_ace.py
    # with --pose_files on the COLMAP-posed video subset) -------------------
    from acezero_tpu.training.buffer import BufferConfig
    from acezero_tpu.training.loss import ReproLossConfig
    from acezero_tpu.training.schedule import ScheduleConfig
    from acezero_tpu.training.trainer import MappingTrainer, TrainConfig

    probe = AceZeroPipeline(_mini_cfg(scene_path, data, tmp_path / "probe"))
    subset = probe.scene.subset(np.arange(6))
    subset.poses_c2w = data["poses_c2w"][:6].astype(np.float32)
    subset.pose_valid = np.ones(6, bool)

    head_cfg = HeadConfig(num_head_blocks=0, use_homogeneous=True)
    trainer = MappingTrainer(
        subset,
        probe.encoder_params,
        head_cfg,
        TrainConfig(
            batch_size=128,
            schedule=ScheduleConfig(schedule="constant", iterations=60,
                                    learning_rate_min=0.003),
            loss=ReproLossConfig(total_iterations=60),
            chunk_steps=10,
        ),
        BufferConfig(max_buffer_size=2048, samples_per_image=128, max_dataset_passes=2),
        base_seed=11,
    )
    warm = trainer.train()
    seed_net = tmp_path / "warm_head.pt"
    torch_io.save_head(seed_net, jax.device_get(warm["head_params"]), head_cfg)

    # ---- stage 2: full-scene reconstruction seeded with that network ------
    cfg = _mini_cfg(
        scene_path, data, tmp_path / "out_warm",
        seed_network=seed_net,
        num_head_blocks=0,
    )
    pipeline = AceZeroPipeline(cfg, encoder_params=probe.encoder_params)
    result = pipeline.run()

    out = tmp_path / "out_warm"
    # the seed stage never ran: no per-seed artifacts, no fastcheck files
    assert not list(out.glob("iteration0_seed*"))
    assert not list(out.glob("poses_*fastcheck*"))
    # the warm map registered frames BEFORE any mapping round of this run
    assert result["rate_history"][0] > 0
    # and the loop still produced the standard artifacts
    assert (out / "poses_final.txt").exists()
    assert (out / "iteration1.pt").exists()
    entries = read_pose_file(out / "poses_final.txt")
    assert len(entries) == 10

    # warm start plumbs the seed network into round-1 mapping init
    # (pipeline.run: warm = warmstart and (iteration > 1 or seed_network)),
    # asserted indirectly: the run completed with iterations >= 1 and the
    # round-1 head exists and differs from the seed head
    _, h1 = torch_io.load_head(out / "iteration1.pt")
    _, h0 = torch_io.load_head(seed_net)
    assert not np.allclose(
        np.asarray(jax.tree.leaves(h1)[0]), np.asarray(jax.tree.leaves(h0)[0])
    )


@pytest.mark.slow
def test_seed_network_beats_cold_start_registration(scene_dir, tmp_path):
    """A warm map trained on posed frames must register at least as many
    frames in its FIRST registration pass as a cold seed map does — the whole
    point of the warm-start recipe (reference README.md:224-242)."""
    scene_path, data = scene_dir

    from acezero_tpu.registration.driver import register_frames
    from acezero_tpu.training.buffer import BufferConfig
    from acezero_tpu.training.loss import ReproLossConfig
    from acezero_tpu.training.schedule import ScheduleConfig
    from acezero_tpu.training.trainer import MappingTrainer, TrainConfig

    probe = AceZeroPipeline(_mini_cfg(scene_path, data, tmp_path / "probe2"))

    def _train(scene, iters, seed):
        head_cfg = HeadConfig(num_head_blocks=0, use_homogeneous=True)
        tr = MappingTrainer(
            scene,
            probe.encoder_params,
            head_cfg,
            TrainConfig(
                batch_size=256,
                schedule=ScheduleConfig(schedule="constant", iterations=iters,
                                        learning_rate_min=0.003),
                loss=ReproLossConfig(total_iterations=iters),
                use_depth=scene.depth_maps is not None and len(scene.depth_maps) > 0,
                chunk_steps=20,
            ),
            BufferConfig(max_buffer_size=4096, samples_per_image=256,
                         max_dataset_passes=2),
            base_seed=seed,
        )
        return tr.train()["head_params"], head_cfg

    # warm: 8 posed frames
    warm_scene = probe.scene.subset(np.arange(8))
    warm_scene.poses_c2w = data["poses_c2w"][:8].astype(np.float32)
    warm_scene.pose_valid = np.ones(8, bool)
    warm_head, head_cfg = _train(warm_scene, 120, seed=11)

    # cold: single-image depth seed at identity (the seed-stage shape)
    from acezero_tpu.data.depth import depth_to_canvas

    cold_scene = probe.scene.subset(np.asarray([0]))
    cold_scene.poses_c2w = np.eye(4, dtype=np.float32)[None]
    cold_scene.pose_valid = np.ones(1, bool)
    h, w = probe.scene.images.sizes[0]
    cold_scene.depth_maps[0] = depth_to_canvas(
        data["depth"][0], (int(h), int(w)), probe.scene.canvas_hw
    )
    cold_head, _ = _train(cold_scene, 120, seed=11)

    cfg = probe._registration_cfg()
    warm_entries = register_frames(
        probe.encoder_params, warm_head, head_cfg, probe.scene, cfg
    )
    cold_entries = register_frames(
        probe.encoder_params, cold_head, head_cfg, probe.scene, cfg
    )
    warm_regs = sum(e.confidence >= 5 for e in warm_entries)
    cold_regs = sum(e.confidence >= 5 for e in cold_entries)
    assert warm_regs >= cold_regs
    assert warm_regs >= 6  # the posed-subset map registers its own frames
