import numpy as np
from scipy.spatial.transform import Rotation

from acezero_tpu.viz import ReconstructionVisualizer, VizConfig
from acezero_tpu.viz.renderer import composite_frame, render_point_cloud
import jax.numpy as jnp


def test_point_splat_basic():
    # one red point straight ahead lands in the image center
    xyz = jnp.asarray([[0.0, 0.0, 2.0]])
    rgb = jnp.asarray([[1.0, 0.0, 0.0]])
    img = np.asarray(
        render_point_cloud(xyz, rgb, jnp.eye(4), 100.0, 64, 64, splat=3)
    )
    center = img[31:35, 31:35]
    assert (center[..., 0] > 0.9).any()
    # background stays white
    assert (img[0, 0] > 0.99).all()


def test_zbuffer_occlusion():
    # near red point occludes far green point at the same pixel
    xyz = jnp.asarray([[0.0, 0.0, 2.0], [0.0, 0.0, 5.0]])
    rgb = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    img = np.asarray(render_point_cloud(xyz, rgb, jnp.eye(4), 100.0, 64, 64, splat=2))
    center = img[32, 32]
    assert center[0] > 0.9 and center[1] < 0.1


def test_visualizer_phases(tmp_path, rng):
    viz = ReconstructionVisualizer(
        VizConfig(target_path=tmp_path / "frames", frame_h=120, frame_w=160, focal=120.0)
    )
    xyz = rng.normal(size=(500, 3)).astype(np.float32)
    viz.update_point_cloud(xyz, np.full((500, 3), 180, np.uint8))

    poses = np.tile(np.eye(4, dtype=np.float64)[None], (4, 1, 1))
    for i in range(4):
        poses[i, :3, :3] = Rotation.random(random_state=np.random.RandomState(i)).as_matrix()
        poses[i, :3, 3] = rng.normal(size=3)

    p1 = viz.render_mapping_frame(poses)
    p2 = viz.render_reloc_frame(poses, np.asarray([100.0, 600.0, 1500.0, 3000.0]))
    assert p1.exists() and p2.exists()
    assert viz.frame_idx == 2

    # state round trip (the cross-stage pickle handoff)
    viz.record_registration("a.jpg", 900.0, iteration=2)
    state_file = tmp_path / "state.pkl"
    viz.save_state(state_file)
    viz2 = ReconstructionVisualizer(
        VizConfig(target_path=tmp_path / "frames2", frame_h=120, frame_w=160)
    )
    viz2.load_state(state_file)
    assert viz2.frame_idx == 2
    assert viz2.cloud_xyz.shape[0] == 500
    assert viz2.registration_history == {"a.jpg": 2}

    sweep = viz2.render_final_sweep(poses, np.asarray([1.0, 1.0, 2.0, 3.0]), num_frames=3)
    assert len(sweep) == 3 and all(p.exists() for p in sweep)


def test_overlays_change_pixels():
    import numpy as np

    from acezero_tpu.viz.overlay import (
        draw_caption,
        draw_conf_histogram,
        draw_loading_bar,
    )

    img = np.full((240, 640, 3), 255, np.uint8)
    out = draw_caption(img, "Neural Mapping", "iteration1 · step 500")
    assert out.shape == img.shape and not np.array_equal(out, img)
    out2 = draw_loading_bar(out, 0.4, "training the scene map")
    assert not np.array_equal(out2, out)
    confs = np.concatenate([np.random.default_rng(0).uniform(0, 400, 50),
                            np.random.default_rng(1).uniform(600, 4000, 50)])
    out3 = draw_conf_histogram(out2, confs, threshold=500.0)
    assert not np.array_equal(out3, out2)
