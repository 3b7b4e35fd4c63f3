"""Configuration schema of the reconstruction pipeline.

Field names and defaults mirror the reference CLI flag surface
(/root/reference/ace_zero.py:33-158 plus the train_ace.py flags the
orchestrator forwards through its command builders,
ace_zero_util.py:63-157), so the published reconstruction recipes translate
1:1.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path


@dataclass
class AceZeroConfig:
    rgb_files: str = ""
    results_folder: Path = Path("results")
    depth_files: str | None = None
    # per-frame focal-length files (scalar or 3x3 K), alphabetical
    # correspondence — the PGT 7-Scenes layout emits these
    calibration_files: str | None = None

    # --- main reconstruction loop (ace_zero.py:44-82) ---
    iterations_max: int = 100
    registration_threshold: float = 0.99
    relative_registration_threshold: float = 0.01
    final_refine: bool = True
    final_refit: bool = True
    final_refit_posewait: int = 5000
    # extra refit<->register cycles after the loop converges (beyond the
    # reference's single final pass, ace_zero.py:251-256). 1 = reference
    # behavior (the default). Ring-topology captures accumulate drift a
    # single pass cannot fully drain; the loop-closure stage below is the
    # primary mechanism for that, but recipes may opt into extra cycles
    # (measured on a held-out 60-view ring: cycles took 52% -> 73%
    # @5cm/5deg, plateau at ~3).
    final_refit_cycles: int = 1
    refit_iterations: int = 25000
    registration_confidence: int = 500
    try_seeds: int = 5
    seed_parallel: bool = True  # train all seed maps as one vmapped program
    seed_iterations: int = 10000
    # early seed selection (beyond-reference speed): score all candidate
    # seed maps after this many iterations on `seed_selection_frames`
    # frames and train only the winner to the full budget (reference
    # trains every seed to 10k then scores on 1000 frames,
    # ace_zero.py:179-211 + ace_zero_util.py:255). 0 restores the
    # reference schedule.
    seed_selection_iterations: int = 2000
    # scoring only needs to RANK the candidate maps; 320 frames at a hard
    # 12-step refineHyp cap ranks identically to 500 @ 24 (measured r5:
    # candidate rates 16-66%, spread far above the subsample noise) at
    # roughly half the stage cost
    seed_selection_frames: int = 320
    # selection only pays off at scale: below this many frames the full
    # seed schedule costs ~1 min total, while cutting the winner's training
    # trajectory measurably perturbs chaotic small-ring reconstructions
    # (measured round 4: chesslike_a 63->18% @5cm/5deg from the numerics of
    # the continuation path alone, trajectory bit-identical once disabled)
    seed_selection_min_frames: int = 200
    seed_network: Path | None = None
    warmstart: bool = True
    export_point_cloud: bool = False
    dense_point_cloud: bool = False

    # --- pose refinement (ace_zero.py:86-93) ---
    refinement: str = "mlp"  # mlp | none | naive
    refinement_ortho: str = "gram-schmidt"
    pose_refinement_wait: int = 0
    pose_refinement_lr: float = 0.001

    # --- calibration refinement (ace_zero.py:97-101) ---
    refine_calibration: bool = True
    use_external_focal_length: float = -1.0  # -1: heuristic 70% diagonal

    # --- ACE early stopping (ace_zero.py:105-113) ---
    learning_rate_schedule: str = "1cyclepoly"
    learning_rate_max: float = 0.003
    learning_rate_min: float = 0.0005
    learning_rate_warmup_iterations: int = 1000
    learning_rate_warmup_learning_rate: float = 0.0005
    cooldown_iterations: int = 5000
    cooldown_threshold: float = 0.7

    # --- general ACE parameters (ace_zero.py:117-136) ---
    image_resolution: int = 480
    num_head_blocks: int = 1
    max_dataset_passes: int = 10
    repro_loss_type: str = "tanh"
    repro_loss_hard_clamp: float = 1000.0
    repro_loss_soft_clamp: float = 50.0
    aug_rotation: float = 15.0
    aug_black_white: float = 0.1  # brightness/contrast jitter half-range
    training_buffer_cpu: bool = False
    iterations: int = 25000  # per-round cap (train_ace.py default)
    batch_size: int = 5120
    max_training_buffer_size: int = 8_000_000
    samples_per_image: int = 1024
    use_homogeneous: bool = True

    # --- registration (ace_zero.py:140-143) ---
    ransac_iterations: int = 32
    ransac_threshold: float = 10.0

    # --- visualization (ace_zero.py:147-155) ---
    render_visualization: bool = False
    render_marker_size: float = 0.03
    render_camera_z_offset: float = 4.0

    # --- misc ---
    random_seed: int = 1305
    base_seed: int = 2089  # trainer seed (train_ace.py:30)
    iterations_output: int = 500
    encoder_path: Path | None = None  # torch .pt encoder weights
    depth_network: Path | None = None  # learned seed-depth head weights
    registration_frame_chunk: int = 64

    # --- loop closure (beyond-reference; no analogue in ace_zero.py) ---
    # Sim(3) pose-graph relaxation over cross-view sheet consistency, run
    # right before each final refit round. Drains the low-frequency drift
    # that incremental map growth accumulates on ring/360-degree captures
    # (reconstruct/loopclose.py). Costs one extra device program over the
    # frames; no-ops gracefully when the graph is degenerate.
    loop_closure: bool = True
    loop_closure_max_frames: int = 256  # graph-size cap (memory bound)
    # drift pre-probe: measure drift on this many evenly-strided frames
    # first and skip the full loop-closure measurement when quiet (saves
    # ~1 min/call on drift-free forward scans at chess scale). 0 disables
    # the probe; probing also auto-disables when the capture has fewer than
    # 2x this many confident frames (the probe would cost as much as the
    # full measurement).
    loop_closure_probe_frames: int = 32
    # adaptive drift drain: extra refit<->register cycles keep running while
    # loop closure measures corrections above its convergence gate
    # (pipeline._drift_detected) — ring captures trigger 2-3 cycles, forward
    # scans none, so the reference's single-final-pass control flow is
    # preserved whenever there is no drift to drain. Hard cap on the extra
    # cycles; 0 disables the adaptive path (explicit final_refit_cycles
    # still honored).
    adaptive_refit_max_cycles: int = 3
    # when refit cycles fail to drain measured drift, emit the loop-closure-
    # corrected pose graph as the FINAL estimate instead of the last
    # registration. Measured round 5 and DEFAULTED OFF: on a deeply bent
    # ring (chesslike_b seed 1305) the corrected graph inherited the bend
    # and scored WORSE than the registration it replaced (18.3 -> 10.0
    # @5cm/5deg); the round-4 82%-offline measurement started from a much
    # better (62.5%) graph. Kept as an opt-in for captures where the graph
    # is known to be coherent.
    loopclose_final_graph: bool = False
    # when loop closure actually applied drift corrections, freeze the
    # pose-refinement MLP for the refit that follows, so the fresh map must
    # ADOPT the corrected geometry instead of co-relaxing the poses back
    # toward the old sheet during training (measured round 4: track BA
    # lifts a held-out ring pose graph 62.5 -> 82% @5cm/5deg offline, but a
    # pose-co-trained refit + registration reverted part of the gain — the
    # map, not the pose set, is the loop's fixed point). Registration after
    # the refit still re-estimates every pose against the adopted map.
    loopclose_refit_freeze_poses: bool = True

    # internal knobs (not in the reference surface)
    # training-scan chunk length (steps per jitted program call); part of
    # the compiled program shape, so keep it constant across rounds. Tiny
    # CPU test configs lower it to avoid paying masked inactive steps.
    chunk_steps: int = 500
    # device-mesh size: 0 = all visible devices, 1 = single device (no mesh),
    # N>1 = 1-D 'data' mesh over the first N devices (SURVEY.md §2.3)
    num_devices: int = 0
    num_decode_workers: int = 16
    # decoded-canvas cache: canvases are pure functions of (files,
    # resolution), so repeat reconstructions of the same scene mmap them
    # back instead of re-paying ~30 s of single-core PNG decode at chess
    # scale. Keyed by per-file size+mtime; None disables.
    decode_cache_dir: Path | None = Path("/tmp/acezero_canvas_cache")
    refinement_steps: int = 100  # registrar refit cap (early-stops on no growth)
    # registrar two-tier refit: first-pass step cap before stragglers re-run
    # densely packed at the full cap (registration/driver.py); <=0 disables
    refit_tier1: int = 16
    # pre-dispatch every big compiled program at pipeline construction so
    # server-side compiles overlap the host image decode instead of
    # serializing into the stages (reconstruct/warmup.py). Only engages at
    # scale (small scenes finish before the warmup pays for itself).
    prewarm: bool = True
    prewarm_min_frames: int = 200
    extras: dict = field(default_factory=dict)
