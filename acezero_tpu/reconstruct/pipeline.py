"""The ACE0 reconstruction loop — one process, one device program per stage.

In-process redesign of the reference orchestrator
(/root/reference/ace_zero.py:160-410 with the command builders of
ace_zero_util.py): instead of spawning train_ace.py / register_mapping.py
subprocesses that exchange state through text files, the pipeline holds the
scene (decoded once), the encoder, the current head, poses, and the focal
estimate as in-memory/device state. The text artifacts (`iterationX.pt`
head checkpoints, `poses_iterationX[_preliminary].txt`, `poses_final.txt`)
are still written every round in the byte-compatible formats — as outputs,
not as IPC.

Loop structure (mirrors ace_zero.py:179-339):
  1. seed stage: try `try_seeds` single-image seeds (depth-initialized),
     10k-iteration mapping each, scored by registration rate on <=1000
     frames; best seed wins;
  2. register all frames to the best seed map;
  3. iterate mapping (self-supervised on confident poses, MLP pose
     refinement + focal refinement, warm-started) and registration of all
     frames, until >=99% registered or <1% improvement;
  4. final refine round, optionally a from-scratch 25k-iteration refit
     (dyntanh + circle schedule + pose wait).
"""

from __future__ import annotations

import logging
import shutil
import time
from pathlib import Path

import jax
import numpy as np

from acezero_tpu.data.depth import DepthEstimator, depth_to_canvas, load_depth_file
from acezero_tpu.data.scene import SceneData, load_scene
from acezero_tpu.io.pose_files import (
    PoseFileEntry,
    get_files_from_glob,
    registration_rates,
    write_pose_file,
)
from acezero_tpu.models import torch_io
from acezero_tpu.models.encoder import init_encoder_params
from acezero_tpu.models.head import HeadConfig
from acezero_tpu.registration.driver import RegistrationConfig, register_frames
from acezero_tpu.registration.ransac import RansacConfig
from acezero_tpu.reconstruct.config import AceZeroConfig
from acezero_tpu.training.buffer import BufferConfig
from acezero_tpu.training.loss import ReproLossConfig
from acezero_tpu.training.schedule import ScheduleConfig
from acezero_tpu.training.trainer import MappingTrainer, TrainConfig
from acezero_tpu.utils.profiling import stage, stage_report

_logger = logging.getLogger(__name__)


class AceZeroPipeline:
    def __init__(
        self,
        cfg: AceZeroConfig,
        depth_estimator: DepthEstimator | None = None,
        encoder_params: dict | None = None,
    ):
        self.cfg = cfg
        self.out = Path(cfg.results_folder)
        self.out.mkdir(parents=True, exist_ok=True)

        # device mesh (SURVEY.md §2.3): buffer rows + frame batches shard
        # over a 1-D 'data' axis, params/state replicate, XLA inserts the
        # collectives. One device -> no mesh (plain single-chip programs).
        n_dev = cfg.num_devices if cfg.num_devices > 0 else len(jax.devices())
        n_dev = min(n_dev, len(jax.devices()))
        if n_dev > 1:
            from acezero_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh(n_dev)
            _logger.info("Using a %d-device data mesh: %s", n_dev, self.mesh)
        else:
            self.mesh = None

        if encoder_params is not None:
            self.encoder_params = encoder_params
        else:
            enc_path = None
            if cfg.encoder_path is not None and Path(cfg.encoder_path).exists():
                enc_path = Path(cfg.encoder_path)
            else:
                # like the reference's default ace_encoder_pretrained.pt
                # (ace_network.py:14-59): fall back to the newest shipped
                # scene-agnostic encoder so a bare image-glob run works
                weights_dir = Path(__file__).resolve().parents[2] / "weights"
                for cand in ("tpu_encoder_v6.pt", "tpu_encoder_v5.pt", "tpu_encoder_v2.pt"):
                    if (weights_dir / cand).exists():
                        enc_path = weights_dir / cand
                        break
            if enc_path is not None:
                self.encoder_params = jax.tree.map(
                    lambda x: jax.numpy.asarray(x), torch_io.load_encoder(enc_path)
                )
                _logger.info("Loaded pretrained encoder from %s", enc_path)
            else:
                _logger.warning(
                    "No pretrained encoder available — using random initialization. "
                    "Reconstruction quality will be substantially reduced."
                )
                self.encoder_params = init_encoder_params(
                    jax.random.PRNGKey(cfg.base_seed)
                )

        self.head_cfg = HeadConfig(
            num_head_blocks=cfg.num_head_blocks, use_homogeneous=cfg.use_homogeneous
        )

        # prewarm BEFORE the decode so server-side compiles overlap the ~30 s
        # of host PNG decode + the early stages (reconstruct/warmup.py); then
        # load the scene
        files = get_files_from_glob(cfg.rgb_files)
        if cfg.prewarm and self.mesh is None and len(files) >= cfg.prewarm_min_frames:
            from acezero_tpu.reconstruct.warmup import (
                predict_canvas_hw,
                prewarm_programs,
            )

            try:
                canvas_pred = predict_canvas_hw(files[0], cfg.image_resolution)
            except Exception as exc:  # noqa: BLE001
                canvas_pred = None
                _logger.warning("Canvas prediction failed, no prewarm: %s", exc)
            if canvas_pred is not None:
                prewarm_programs(self, len(files), canvas_pred)

        use_heuristic = cfg.use_external_focal_length < 0 and cfg.calibration_files is None
        with stage("scene_load"):
            self.scene = load_scene(
                cfg.rgb_files,
                image_short_size=cfg.image_resolution,
                use_heuristic_focal_length=use_heuristic,
                external_focal_length=(
                    cfg.use_external_focal_length
                    if cfg.use_external_focal_length >= 0
                    else None
                ),
                calibration_files=cfg.calibration_files,
                num_workers=cfg.num_decode_workers,
                decode_cache_dir=(
                    str(cfg.decode_cache_dir) if cfg.decode_cache_dir else None
                ),
            )
        _logger.info(
            "Loaded %d images onto a %dx%d canvas.", len(self.scene), *self.scene.canvas_hw
        )

        self.depth_estimator = depth_estimator
        self.depth_files = (
            get_files_from_glob(cfg.depth_files) if cfg.depth_files is not None else None
        )
        if self.depth_files is None and self.depth_estimator is None:
            # bare image-glob UX (reference ace_zero.py:170-173 boots ZoeDepth
            # automatically): fall back to the learned in-process estimator.
            # NOTE: depth heads consume the ENCODER's features, so each head
            # is paired with the encoder it was trained on (v4 head <-> v6, v3 <-> v5
            # encoder, v1 head <-> v2 encoder; the v2 head targeted the
            # retired v3 encoder and is no longer preferred).
            weights_dir = Path(__file__).resolve().parents[2] / "weights"
            candidates = (
                [cfg.depth_network]
                if cfg.depth_network
                else [weights_dir / "tpu_depth_v4.pt", weights_dir / "tpu_depth_v3.pt", weights_dir / "tpu_depth_v1.pt"]
            )
            for depth_net in candidates:
                if Path(depth_net).exists():
                    from acezero_tpu.data.depth import learned_depth_estimator

                    self.depth_estimator = learned_depth_estimator(
                        depth_net, encoder_params=self.encoder_params
                    )
                    _logger.info("Using learned seed-depth estimator: %s", depth_net)
                    break

        if cfg.render_visualization:
            from acezero_tpu.viz import ReconstructionVisualizer, VizConfig

            self.visualizer = ReconstructionVisualizer(
                VizConfig(
                    target_path=self.out / "renderings",
                    marker_size=cfg.render_marker_size,
                    camera_z_offset=cfg.render_camera_z_offset,
                    conf_threshold=cfg.registration_confidence,
                )
            )
        else:
            self.visualizer = None

        self._probe_memo = None  # see _loop_close

    # ------------------------------------------------------------- configs

    def _schedule(self, iterations: int, schedule: str | None = None, lr_max: float | None = None):
        cfg = self.cfg
        return ScheduleConfig(
            schedule=schedule or cfg.learning_rate_schedule,
            iterations=iterations,
            learning_rate_min=cfg.learning_rate_min,
            learning_rate_max=lr_max if lr_max is not None else cfg.learning_rate_max,
            warmup_iterations=cfg.learning_rate_warmup_iterations,
            warmup_learning_rate=cfg.learning_rate_warmup_learning_rate,
            cooldown_iterations=cfg.cooldown_iterations,
            cooldown_trigger_percent=cfg.cooldown_threshold,
        )

    def _buffer_cfg(self) -> BufferConfig:
        cfg = self.cfg
        return BufferConfig(
            max_buffer_size=cfg.max_training_buffer_size,
            samples_per_image=cfg.samples_per_image,
            max_dataset_passes=cfg.max_dataset_passes,
            use_aug=True,
            aug_rotation=cfg.aug_rotation,
            aug_black_white=cfg.aug_black_white,
        )

    def _pose_bucket(self) -> int:
        """Pose-table bucket pinned to the FULL scene's bucket: every
        mapping/refit round trains on a different confident subset, and
        per-round table shapes would mean per-round recompiles of the train
        chunk (the relay charges a large first-call cost per program)."""
        from acezero_tpu.training.buffer import next_bucket

        return next_bucket(len(self.scene), 8)

    def _base_train_cfg(
        self, iterations: int, use_depth: bool, refine: bool, pose_bucket: int = 0
    ) -> TrainConfig:
        cfg = self.cfg
        return TrainConfig(
            batch_size=cfg.batch_size,
            schedule=self._schedule(iterations),
            loss=ReproLossConfig(
                total_iterations=iterations,
                soft_clamp=cfg.repro_loss_soft_clamp,
                soft_clamp_min=1.0,
                loss_type=cfg.repro_loss_type,
            ),
            repro_loss_hard_clamp=cfg.repro_loss_hard_clamp,
            pose_refinement=cfg.refinement if refine else "none",
            pose_refinement_lr=cfg.pose_refinement_lr,
            pose_refinement_wait=cfg.pose_refinement_wait,
            refinement_ortho=cfg.refinement_ortho,
            refine_calibration=cfg.refine_calibration if refine else False,
            use_depth=use_depth,
            buffer_host_spill=cfg.training_buffer_cpu,
            iterations_output=cfg.iterations_output,
            chunk_steps=cfg.chunk_steps,
            pose_table_bucket=pose_bucket,
        )

    def _refit_train_cfg(self, freeze_poses: bool = False) -> TrainConfig:
        """Final-refit recipe (reference ace_zero_util.get_refit_mapping_cmd
        :63-109): dyntanh loss, circle schedule at lr 0.005, 25k iterations,
        frozen poses for the first final_refit_posewait steps.

        freeze_poses: freeze the pose MLP for the WHOLE refit — used after
        loop closure applied drift corrections, so the fresh map adopts the
        corrected geometry (config.loopclose_refit_freeze_poses)."""
        cfg = self.cfg
        return TrainConfig(
            batch_size=cfg.batch_size,
            schedule=self._schedule(cfg.refit_iterations, schedule="circle", lr_max=0.005),
            loss=ReproLossConfig(
                total_iterations=cfg.refit_iterations,
                soft_clamp=cfg.repro_loss_soft_clamp,
                soft_clamp_min=1.0,
                loss_type="dyntanh",
            ),
            repro_loss_hard_clamp=cfg.repro_loss_hard_clamp,
            pose_refinement=cfg.refinement,
            pose_refinement_lr=cfg.pose_refinement_lr,
            pose_refinement_wait=(
                cfg.refit_iterations if freeze_poses else cfg.final_refit_posewait
            ),
            refinement_ortho=cfg.refinement_ortho,
            refine_calibration=cfg.refine_calibration,
            use_depth=False,
            buffer_host_spill=cfg.training_buffer_cpu,
            iterations_output=cfg.iterations_output,
            chunk_steps=cfg.chunk_steps,
            pose_table_bucket=self._pose_bucket(),
        )

    def _registration_cfg(self, max_estimates: int = -1) -> RegistrationConfig:
        cfg = self.cfg
        return RegistrationConfig(
            ransac=RansacConfig(
                hypotheses=cfg.ransac_iterations,
                max_tries=16,
                inlier_threshold=cfg.ransac_threshold,
                refinement_steps=cfg.refinement_steps,
            ),
            confidence_threshold=cfg.registration_confidence,
            max_estimates=max_estimates,
            frame_chunk=cfg.registration_frame_chunk,
            base_seed=cfg.random_seed,
            refit_tier1=cfg.refit_tier1,
        )

    # --------------------------------------------------------------- seeds

    def _seed_depth_canvas(self, frame_idx: int) -> np.ndarray:
        h, w = self.scene.images.sizes[frame_idx]
        if self.depth_files is not None:
            depth = load_depth_file(self.depth_files[frame_idx])
        elif self.depth_estimator is not None:
            from PIL import Image

            with Image.open(self.scene.rgb_files[frame_idx]) as img:
                rgb = np.asarray(img.convert("RGB"))
            depth = self.depth_estimator(rgb)
        else:
            raise ValueError(
                "Seed initialization needs depth: pass depth_files or a depth_estimator."
            )
        return depth_to_canvas(depth, (int(h), int(w)), self.scene.canvas_hw)

    def _map_seed(self, seed_idx: int, seed_value: float) -> tuple[dict, float, str]:
        cfg = self.cfg
        iteration_id = f"iteration0_seed{seed_idx}"
        frame = int(seed_value * len(self.scene))
        _logger.info("Mapping seed %d: frame %d (%s)", seed_idx, frame, self.scene.rgb_files[frame])

        seed_scene = self.scene.subset(np.asarray([frame]))
        seed_scene.poses_c2w = np.eye(4, dtype=np.float32)[None]
        seed_scene.pose_valid = np.ones(1, bool)
        seed_scene.depth_maps[0] = self._seed_depth_canvas(frame)

        trainer = MappingTrainer(
            seed_scene,
            self.encoder_params,
            self.head_cfg,
            self._base_train_cfg(cfg.seed_iterations, use_depth=True, refine=False),
            self._buffer_cfg(),
            base_seed=cfg.base_seed + seed_idx,  # same per-seed stream as _map_seeds_parallel
            mesh=self.mesh,
        )
        with stage("seed_mapping", trace=True):
            result = trainer.train()
        head_params = result["head_params"]
        torch_io.save_head(self.out / f"{iteration_id}.pt", jax.device_get(head_params), self.head_cfg)

        # fast seed scoring on <=1000 frames (ace_zero_util.py:242-259)
        entries = register_frames(
            self.encoder_params,
            head_params,
            self.head_cfg,
            self.scene,
            self._registration_cfg(max_estimates=1000),
            mesh=self.mesh,
        )
        write_pose_file(self.out / f"poses_{iteration_id}_fastcheck.txt", entries)
        rate = registration_rates(
            [e.confidence for e in entries], [cfg.registration_confidence]
        )[0]
        _logger.info("Seed %d registered %.1f%% of frames.", seed_idx, rate * 100)
        return head_params, rate, iteration_id

    def _build_seed_trainers(
        self, frames, train_cfg, key, buffers, ctxs, states, trainers
    ) -> None:
        """Per-seed MappingTrainer + buffer + state construction (the ONE
        construction path shared with _map_seed; only the train loop itself
        is replaced by the vmapped chunk program)."""
        cfg = self.cfg
        for si, frame in enumerate(frames):
            seed_scene = self.scene.subset(np.asarray([frame]))
            seed_scene.poses_c2w = np.eye(4, dtype=np.float32)[None]
            seed_scene.pose_valid = np.ones(1, bool)
            seed_scene.depth_maps[0] = self._seed_depth_canvas(frame)

            trainer = MappingTrainer(
                seed_scene,
                self.encoder_params,
                self.head_cfg,
                train_cfg,
                self._buffer_cfg(),
                base_seed=cfg.base_seed + si,
            )
            key, k_fill, k_train = jax.random.split(key, 3)
            buffers.append(trainer.build_buffer(k_fill, shard=False))
            states.append(trainer.build_state(k_train, replicate_on_mesh=False))
            ctxs.append(trainer.ctx)
            trainers.append(trainer)

    def _map_seeds_parallel(self, seeds: np.ndarray) -> list[tuple[dict, float, str]]:
        """Train all candidate seed maps in-process on one shared program.

        Replaces the reference's joblib process pool over seeds
        (ace_zero.py:184-196). S tiny maps (1-image buffers, ~4MB heads)
        train sequentially through the SAME compiled chunk program — on the
        axon relay each distinct program pays a large per-process
        first-call cost, so one reused program beats a vmapped S-lane
        stack even though the stack is a single batched dispatch (the
        device time is S*steps either way; see the seed_training stage
        comment).
        """
        cfg = self.cfg
        train_cfg = self._base_train_cfg(cfg.seed_iterations, use_depth=True, refine=False)
        if train_cfg.buffer_host_spill:
            # 1-image seed buffers are a few thousand rows — host spill is
            # pointless and the chunk program wants device arrays
            from dataclasses import replace as _replace

            train_cfg = _replace(train_cfg, buffer_host_spill=False)
        S = len(seeds)
        frames = [int(s * len(self.scene)) for s in seeds]

        key = jax.random.PRNGKey(cfg.base_seed)
        buffers, ctxs, states = [], [], []
        trainers = []
        with stage("seed_buffer_fill"):
            self._build_seed_trainers(
                frames, train_cfg, key, buffers, ctxs, states, trainers
            )
            # ONE construction path with _map_seed / the main loop: a
            # MappingTrainer per seed builds its buffer + state; only the
            # train loop itself is replaced by the vmapped chunk program
        import time as _time

        from acezero_tpu.registration.driver import register_frames_multi
        from acezero_tpu.training.trainer import _train_chunk

        # Early seed selection (beats the reference's budget,
        # ace_zero.py:179-211, which trains every seed to the full 10k):
        # train the S-seed stack only to `seed_selection_iterations`, score
        # all maps on a small frame subsample with one shared encoder pass,
        # then continue ONLY the winner to its full (possibly cooldown-
        # early-stopped) budget on the single-map program. Lane-FLOPs drop
        # from S*full to S*sel + 1*(full-sel); the loser heads keep their
        # selection-time state in the `iteration0_seedN.pt` artifacts.
        sel_iters = cfg.seed_selection_iterations
        do_select = (
            0 < sel_iters < cfg.seed_iterations
            and S > 1
            and len(self.scene) >= cfg.seed_selection_min_frames
        )

        t0 = _time.time()
        chunk = train_cfg.chunk_steps
        sync_chunks = max(1, train_cfg.sync_every_chunks)
        with stage("seed_training"):
            # Lanes train SEQUENTIALLY on the same single-map chunk program
            # the winner continuation reuses (and that the seed buffers
            # share shapes with). A vmapped S-lane stack is the same FLOPs
            # in one program, but on the axon relay every DISTINCT compiled
            # program pays a large per-process first-call cost (measured
            # 90-230 s for the stacked chunk with a LOCAL cache hit, vs
            # 2.9 s steady state); sequential lanes add zero new programs
            # to the critical path and cost the same device time.
            #
            # Dispatch is async on the relay; only FETCHES block. With a
            # static selection budget the whole per-lane chunk sequence is
            # dispatched without a single host round-trip (steps past the
            # schedule's dynamic max_iterations are no-ops inside the
            # chunk); without selection, lanes sync once per
            # sync_every_chunks chunks like MappingTrainer.train().
            for si in range(S):
                st = states[si]
                if do_select:
                    for _ in range(-(-sel_iters // chunk)):
                        st, _ = _train_chunk(
                            st, buffers[si], ctxs[si], train_cfg, self.head_cfg, chunk
                        )
                else:
                    while True:
                        for _ in range(sync_chunks):
                            st, _ = _train_chunk(
                                st, buffers[si], ctxs[si], train_cfg, self.head_cfg, chunk
                            )
                        it, max_it = (
                            int(v)
                            for v in jax.device_get((st.iteration, st.sched.max_iterations))
                        )
                        if it >= max_it:
                            break
                states[si] = st
        iters = [int(v) for v in jax.device_get([st.iteration for st in states])]
        _logger.info(
            "Trained %d seed maps (sequential, shared program): iterations %s in %.1fs",
            S, iters, _time.time() - t0,
        )

        # fast scoring: all seed maps registered per chunk with one shared
        # encoder pass (register_frames_multi)
        max_est = cfg.seed_selection_frames if do_select else 1000
        head_list = [st.head_params for st in states]
        score_cfg = self._registration_cfg(max_estimates=max_est)
        if do_select:
            # scoring only needs to RANK the seed maps: a hard 12-step
            # refineHyp cap (no tier-2 rerun) lowers every map's inlier
            # counts by the same mechanism and preserves the ranking, at a
            # fraction of the full budget's worst-lane cost. The winner's
            # frames are re-registered with the production budget right
            # after selection anyway.
            from dataclasses import replace as _replace

            score_cfg = _replace(
                score_cfg,
                ransac=_replace(score_cfg.ransac, refinement_steps=12),
                refit_tier1=0,
            )
        with stage("seed_scoring"):
            all_entries = register_frames_multi(
                self.encoder_params,
                head_list,
                self.head_cfg,
                self.scene,
                score_cfg,
                mesh=self.mesh,
            )
        rates = [
            registration_rates(
                [e.confidence for e in entries], [cfg.registration_confidence]
            )[0]
            for entries in all_entries
        ]

        if do_select:
            best = int(np.argmax(rates))
            _logger.info(
                "Seed selection at %d iters on %d frames: rates %s -> seed %d; "
                "continuing only the winner.",
                sel_iters, max_est, [f"{r:.3f}" for r in rates], best,
            )
            state_b, buffer_b, ctx_b = states[best], buffers[best], ctxs[best]
            t1 = _time.time()
            with stage("seed_training"):
                while True:
                    for _ in range(sync_chunks):
                        state_b, _ = _train_chunk(
                            state_b, buffer_b, ctx_b, train_cfg, self.head_cfg, chunk
                        )
                    it, max_it = (
                        int(v)
                        for v in jax.device_get(
                            (state_b.iteration, state_b.sched.max_iterations)
                        )
                    )
                    if it >= max_it:
                        break
            _logger.info(
                "Winner seed %d trained to %d iterations in %.1fs.",
                best, int(state_b.iteration), _time.time() - t1,
            )
            head_list[best] = state_b.head_params

        results = []
        for si in range(S):
            iteration_id = f"iteration0_seed{si}"
            torch_io.save_head(
                self.out / f"{iteration_id}.pt", jax.device_get(head_list[si]), self.head_cfg
            )
            entries = all_entries[si]
            write_pose_file(self.out / f"poses_{iteration_id}_fastcheck.txt", entries)
            _logger.info("Seed %d registered %.1f%% of frames.", si, rates[si] * 100)
            results.append((head_list[si], rates[si], iteration_id))
        return results

    # ----------------------------------------------------------------- run

    def _register_all(
        self, head_params: dict, iteration_id: str, focal_override: float | None
    ) -> list[PoseFileEntry]:
        with stage("registration", trace=True):
            entries = register_frames(
                self.encoder_params,
                head_params,
                self.head_cfg,
                self.scene,
                self._registration_cfg(),
                focal_override_orig=focal_override,
                mesh=self.mesh,
            )
        with stage("artifacts"):
            write_pose_file(self.out / f"poses_{iteration_id}.txt", entries)
        if self.visualizer is not None:
            self._render_round(head_params, iteration_id, entries)
        return entries

    def _loop_close(
        self, entries: list[PoseFileEntry], head_params: dict, focal_estimate: float | None
    ) -> tuple[list[PoseFileEntry], dict]:
        """Sim(3) pose-graph loop closure over the current map's cross-view
        sheet consistency (reconstruct/loopclose.py). Applied right before a
        refit round so the fresh network trains from drift-corrected poses.
        No-ops (returns entries unchanged) when disabled or degenerate.

        Returns (corrected entries, diagnostics); the diagnostics carry the
        median correction magnitude that gates the adaptive refit cycles."""
        if not self.cfg.loop_closure:
            return entries, {"skipped": "disabled"}
        from acezero_tpu.reconstruct.loopclose import loop_close_entries

        rate_now = registration_rates(
            [e.confidence for e in entries], [self.cfg.registration_confidence]
        )[0]
        # probe memo: a previous probe this run measured drift WELL below the
        # gate (half margin) and registration has not degraded since — the
        # refit between the two calls trained from those very poses, so
        # re-measuring is ~15 s of chip time for the same answer. Ring
        # captures trip the gate on the first probe and never take this path.
        memo = getattr(self, "_probe_memo", None)
        if memo is not None and rate_now >= memo["rate"] - 0.01:
            _logger.info(
                "Loop-closure probe memo: previous probe was drift-free with "
                "margin (%.2f cm / %.3f deg) and registration held — skipping.",
                memo["median_corr_t"] * 100, memo["median_corr_rot_deg"],
            )
            return entries, {**memo["diag"], "skipped": "probe_memo"}

        # Cheap drift pre-probe: the full measurement costs ~2400-frame
        # captures ~1 min/call even when the capture is drift-free (forward
        # scans report millimetre corrections and never trigger a cycle).
        # A small evenly-strided subgraph measures the same low-frequency
        # drift signal at a fraction of the cost; only when it trips the
        # drift gate does the full-graph measurement (whose corrections are
        # actually applied) run.
        probe_n = self.cfg.loop_closure_probe_frames
        n_conf = sum(
            e.confidence >= self.cfg.registration_confidence for e in entries
        )
        if 0 < probe_n * 2 <= n_conf:
            from dataclasses import replace as _replace

            from acezero_tpu.reconstruct.loopclose import LoopCloseConfig

            with stage("loop_closure_probe", trace=True):
                _, probe_diag = loop_close_entries(
                    self.encoder_params,
                    head_params,
                    self.head_cfg,
                    self.scene,
                    entries,
                    conf_threshold=self.cfg.registration_confidence,
                    focal_override_orig=focal_estimate,
                    # pure drift measurement: the BA polish only matters on
                    # the full graph whose corrections get applied
                    cfg=_replace(LoopCloseConfig(), ba="off"),
                    max_frames=probe_n,
                )
            # an inconclusive probe ("skipped" set: degenerate subgraph)
            # falls through to the full measurement
            if "skipped" not in probe_diag and not self._drift_detected(probe_diag):
                _logger.info(
                    "Loop-closure probe: no drift (median %.2f cm / %.3f deg) "
                    "— skipping the full measurement.",
                    probe_diag.get("median_corr_t", 0.0) * 100,
                    probe_diag.get("median_corr_rot_deg", 0.0),
                )
                probe_diag["skipped"] = "probe_no_drift"
                # memoize strongly drift-free probes (half the gate) so the
                # adaptive-cycle check after the refit skips re-measuring
                t_gate = max(0.005 * probe_diag.get("scene_diag", 0.0), 0.01)
                corr_t = probe_diag.get("median_corr_t", 0.0)
                corr_r = probe_diag.get("median_corr_rot_deg", 0.0)
                if corr_t < 0.5 * t_gate and corr_r < 0.25:
                    self._probe_memo = {
                        "rate": rate_now,
                        "median_corr_t": corr_t,
                        "median_corr_rot_deg": corr_r,
                        "diag": dict(probe_diag),
                    }
                return entries, probe_diag

        self._probe_memo = None  # geometry is about to be measured/corrected
        with stage("loop_closure", trace=True):
            corrected, diag = loop_close_entries(
                self.encoder_params,
                head_params,
                self.head_cfg,
                self.scene,
                entries,
                conf_threshold=self.cfg.registration_confidence,
                focal_override_orig=focal_estimate,
                max_frames=self.cfg.loop_closure_max_frames,
            )
        return corrected, diag

    def _drift_detected(self, lc_diag: dict) -> bool:
        """True when loop closure measured corrections large enough that one
        refit round cannot have drained the drift (the adaptive-cycle
        trigger). Thresholds sit well under the 5cm/5deg accuracy bar but
        above the correction noise floor of a converged map (measured: a
        drifted 60-view ring reports ~6 cm median correction on a ~6 m
        scene; converged forward sweeps report millimetres)."""
        if "skipped" in lc_diag:
            return False
        diag_len = lc_diag.get("scene_diag", 0.0)
        t_gate = max(0.005 * diag_len, 0.01)
        return (
            lc_diag.get("median_corr_t", 0.0) > t_gate
            or lc_diag.get("median_corr_rot_deg", 0.0) > 0.5
        )

    def _render_round(self, head_params: dict, iteration_id: str, entries) -> None:
        """Visualization hooks after a registration round: update the point
        cloud from the current map, render mapping + reloc frames, persist
        state (the reference renders per-step; we render per-round, which
        keeps the video while staying off the training hot path)."""
        from acezero_tpu.export.point_cloud import point_cloud_from_network

        it_num = int(iteration_id.replace("iteration", "").split("_")[0] or 0) \
            if iteration_id.startswith("iteration") and iteration_id[9:10].isdigit() else 0
        confident = [e for e in entries if e.confidence >= self.cfg.registration_confidence]
        if confident:
            xyz, rgb = point_cloud_from_network(
                self.encoder_params, head_params, self.head_cfg,
                self.scene, confident[: min(len(confident), 64)],
            )
            self.visualizer.update_point_cloud(xyz, rgb)
        for e in entries:
            self.visualizer.record_registration(e.rgb_file, e.confidence, it_num)
        poses = np.stack([e.pose_c2w for e in entries])
        confs = np.asarray([e.confidence for e in entries])
        # progressive reveal: queries pop in group by group, like the
        # reference's one-frame-per-query reloc phase
        # (/root/reference/register_mapping.py:267-271), at a bounded frame
        # budget per round
        n = len(entries)
        groups = np.array_split(np.arange(n), min(12, n))
        shown = 0
        for g in groups:
            shown += len(g)
            self.visualizer.render_reloc_frame(
                poses[:shown],
                confs[:shown],
                caption=f"{iteration_id}: {shown}/{n} images queried",
            )
        self.visualizer.save_state(self.out / "renderings" / f"{iteration_id}_register.pkl")

    def _mapping_scene_from_entries(self, entries: list[PoseFileEntry]) -> SceneData:
        """Confidence-filtered mapping scene for the next round (the in-memory
        analogue of `--use_ace_pose_file poses_prev.txt`)."""
        cfg = self.cfg
        by_file = {f: i for i, f in enumerate(self.scene.rgb_files)}
        keep = [e for e in entries if e.confidence >= cfg.registration_confidence]
        if not keep:
            # Robustness beyond the reference (which would crash training on an
            # empty dataset): fall back to the most-confident frames so the
            # loop can keep trying to grow the map.
            k = max(1, len(entries) // 10)
            keep = sorted(entries, key=lambda e: -e.confidence)[:k]
            _logger.warning(
                "No frames above confidence %.0f — falling back to the %d most "
                "confident (best %.0f).",
                cfg.registration_confidence,
                k,
                keep[0].confidence,
            )
        indices = np.asarray([by_file[e.rgb_file] for e in keep])
        sub = self.scene.subset(indices, copy_canvases=False)
        sub.poses_c2w = np.stack([e.pose_c2w for e in keep]).astype(np.float32)
        sub.pose_valid = np.ones(len(keep), bool)
        sub.focals_orig = np.asarray([e.focal_length for e in keep], np.float32)
        sub.focals_canvas = sub.focals_orig * sub.images.scale_factors
        return sub

    def run(self) -> dict:
        cfg = self.cfg
        t_start = time.time()

        # ---------------- seed stage (or seed network) --------------------
        if cfg.seed_network is not None:
            iteration_id = Path(cfg.seed_network).stem
            _logger.info("Starting from seed network %s", cfg.seed_network)
            _, head_params = torch_io.load_head(cfg.seed_network)
            head_params = jax.tree.map(jax.numpy.asarray, head_params)
        else:
            np.random.seed(cfg.random_seed)
            seeds = np.random.uniform(size=cfg.try_seeds)
            _logger.info("Trying seeds: %s", seeds)
            if cfg.seed_parallel and cfg.try_seeds > 1:
                results = self._map_seeds_parallel(seeds)
            else:
                results = [self._map_seed(i, s) for i, s in enumerate(seeds)]
            rates = [r[1] for r in results]
            best = int(np.argmax(rates))
            head_params, _, iteration_id = results[best]
            _logger.info(
                "Selected seed %s with registration rate %.1f%%", iteration_id, rates[best] * 100
            )

        # register everything against the seed map (heuristic/external focal)
        entries = self._register_all(head_params, iteration_id, focal_override=None)
        max_rate = registration_rates(
            [e.confidence for e in entries], [cfg.registration_confidence]
        )[0]
        _logger.info("Seed map registered %.1f%% of all frames.", max_rate * 100)

        scheduled_to_stop_early = False
        focal_estimate: float | None = None
        iteration = 0
        lc_applied = False  # loop closure applied corrections before this refit
        rate_history = [max_rate]  # per-round registration rates (diagnostics)

        # ------------------------- main loop ------------------------------
        for iteration in range(1, cfg.iterations_max):
            iteration_id = f"iteration{iteration}"
            refit_round = scheduled_to_stop_early and cfg.final_refit

            with stage("scene_subset"):
                mapping_scene = self._mapping_scene_from_entries(entries)
            _logger.info(
                "%s: mapping on %d confident frames%s",
                iteration_id,
                len(mapping_scene),
                " (final refit)" if refit_round else "",
            )

            if refit_round:
                train_cfg = self._refit_train_cfg(
                    freeze_poses=cfg.loopclose_refit_freeze_poses and lc_applied
                )
                init_head = None  # fresh network (ace_zero.py:269-272)
            else:
                train_cfg = self._base_train_cfg(
                    cfg.iterations, use_depth=False, refine=True,
                    pose_bucket=self._pose_bucket(),
                )
                warm = cfg.warmstart and (iteration > 1 or cfg.seed_network is not None)
                init_head = head_params if warm else None

            frame_cb = None
            if self.visualizer is not None:
                max_it = train_cfg.schedule.iterations

                def frame_cb(it, poses_w2c, _id=iteration_id, _max=max_it):
                    c2w = np.linalg.inv(
                        np.concatenate(
                            [poses_w2c, np.tile([[[0, 0, 0, 1.0]]], (len(poses_w2c), 1, 1))],
                            axis=1,
                        )
                    )
                    self.visualizer.render_mapping_frame(
                        c2w, caption=f"{_id} · step {it}", progress=it / max(_max, 1)
                    )

            with stage("mapping", trace=True):
                trainer = MappingTrainer(
                    mapping_scene,
                    self.encoder_params,
                    self.head_cfg,
                    train_cfg,
                    self._buffer_cfg(),
                    head_params=init_head,
                    base_seed=cfg.base_seed,
                    mesh=self.mesh,
                    frame_callback=frame_cb,
                )
                result = trainer.train()
            head_params = result["head_params"]

            with stage("artifacts"):
                torch_io.save_head(
                    self.out / f"{iteration_id}.pt", jax.device_get(head_params), self.head_cfg
                )
            # preliminary poses: refined w2c with confidence = inf
            focal_estimate = result["focal_orig"] or float(mapping_scene.focals_orig[0])
            prelim = [
                PoseFileEntry(
                    rgb_file=mapping_scene.rgb_files[i],
                    pose_w2c=np.vstack([result["poses_w2c"][i], [0, 0, 0, 1]]),
                    focal_length=focal_estimate,
                    confidence=float("inf"),
                )
                for i in range(len(mapping_scene))
            ]
            with stage("artifacts"):
                write_pose_file(self.out / f"poses_{iteration_id}_preliminary.txt", prelim)

            entries = self._register_all(head_params, iteration_id, focal_override=focal_estimate)
            rate = registration_rates(
                [e.confidence for e in entries], [cfg.registration_confidence]
            )[0]
            _logger.info("%s: registered %.1f%% of all frames.", iteration_id, rate * 100)
            rate_history.append(rate)

            if scheduled_to_stop_early:
                break

            if (rate >= cfg.registration_threshold) or (
                (rate - max_rate) < cfg.relative_registration_threshold
            ):
                if cfg.final_refine:
                    _logger.info("Stopping criteria met — one final mapping round.")
                    scheduled_to_stop_early = True
                else:
                    break
            if iteration >= cfg.iterations_max - 2:
                scheduled_to_stop_early = True
            if scheduled_to_stop_early:
                # drain accumulated drift before the final refit retrains
                # the map from these poses (reconstruct/loopclose.py)
                entries, lc_diag = self._loop_close(entries, head_params, focal_estimate)
                lc_applied = "skipped" not in lc_diag and self._drift_detected(lc_diag)
            max_rate = max(rate, max_rate)

        # ---------------- extra refit cycles (drift drain) ----------------
        # beyond-reference: repeat refit->register after convergence; ring
        # captures need it to drain accumulated translation drift. Cycles
        # run while (a) the recipe explicitly asked for them
        # (final_refit_cycles > 1), or (b) loop closure measures corrections
        # big enough that one refit cannot have drained the drift
        # (_drift_detected; capped at adaptive_refit_max_cycles). Forward
        # scans report mm-scale corrections and never trigger (b), so the
        # default control flow stays the reference's single final pass
        # (ace_zero.py:251-256). Each cycle is one fresh dyntanh refit + one
        # registration pass (~1 min on one chip at 60 frames).
        extra = 0
        drift_converged = False  # loop exited via a measured-no-drift break
        while cfg.final_refit:
            extra += 1
            explicit = extra < max(1, cfg.final_refit_cycles)
            adaptive_allowed = (
                cfg.loop_closure and extra <= cfg.adaptive_refit_max_cycles
            )
            if not explicit and not adaptive_allowed:
                break
            corrected, lc_diag = self._loop_close(entries, head_params, focal_estimate)
            if not explicit and not self._drift_detected(lc_diag):
                drift_converged = True
                break  # converged: keep the uncorrected (registration) poses
            lc_applied = "skipped" not in lc_diag and self._drift_detected(lc_diag)
            entries = corrected
            iteration += 1
            iteration_id = f"iteration{iteration}"
            mapping_scene = self._mapping_scene_from_entries(entries)
            _logger.info(
                "%s: extra refit cycle %d on %d frames%s",
                iteration_id, extra, len(mapping_scene),
                " (poses frozen: adopting loop-closure geometry)" if (
                    lc_applied and cfg.loopclose_refit_freeze_poses
                ) else "",
            )
            with stage("mapping", trace=True):
                trainer = MappingTrainer(
                    mapping_scene,
                    self.encoder_params,
                    self.head_cfg,
                    self._refit_train_cfg(
                        freeze_poses=cfg.loopclose_refit_freeze_poses and lc_applied
                    ),
                    self._buffer_cfg(),
                    base_seed=cfg.base_seed + extra,
                    mesh=self.mesh,
                )
                result = trainer.train()
            head_params = result["head_params"]
            with stage("artifacts"):
                torch_io.save_head(
                    self.out / f"{iteration_id}.pt", jax.device_get(head_params), self.head_cfg
                )
            focal_estimate = result["focal_orig"] or focal_estimate
            entries = self._register_all(head_params, iteration_id, focal_override=focal_estimate)
            rate = registration_rates(
                [e.confidence for e in entries], [cfg.registration_confidence]
            )[0]
            _logger.info("%s: registered %.1f%% of all frames.", iteration_id, rate * 100)
            rate_history.append(rate)

        # ---------- final consistency choice (rings; round-5 mechanism) ----
        # When loop closure APPLIED corrections during this run (ring-drift
        # behavior) the refit<->register loop may never fully adopt them:
        # the corrected poses are globally consistent but the refit map
        # compromises between them and the per-frame image evidence, and
        # registration then re-anchors onto that compromise — the bent map
        # is a fixed point (measured round 4: corrected pose graph 82%
        # offline vs 50-67% after refit+register e2e). Measure once more at
        # the end: if the refits FAILED to drain the drift, output the
        # corrected, globally-consistent pose graph itself instead of the
        # bent registration. Forward scans never apply corrections (drift
        # gate), so this path costs them nothing and cannot regress them
        # (post-hoc correction of a converged sweep was measured to HURT,
        # 94.96 -> 92.7 — hence the lc_applied gate, not an unconditional
        # final polish).
        if (
            cfg.final_refit
            and cfg.loop_closure
            and cfg.loopclose_final_graph
            and lc_applied
            and not drift_converged
        ):
            corrected, lc_diag = self._loop_close(entries, head_params, focal_estimate)
            if "skipped" not in lc_diag and self._drift_detected(lc_diag):
                _logger.info(
                    "Final drift check: refit cycles did not drain the measured "
                    "drift (median %.2f cm / %.3f deg) — emitting the loop-"
                    "closure-corrected pose graph as the final estimate.",
                    lc_diag.get("median_corr_t", 0.0) * 100,
                    lc_diag.get("median_corr_rot_deg", 0.0),
                )
                entries = corrected
                iteration_id = f"iteration{iteration}_loopclosed"
                with stage("artifacts"):
                    write_pose_file(self.out / f"poses_{iteration_id}.txt", entries)

        # ------------------------- outputs --------------------------------
        if self.visualizer is not None:
            _logger.info("Rendering final sweep.")
            poses = np.stack([e.pose_c2w for e in entries])
            first_it = np.asarray(
                [self.visualizer.registration_history.get(e.rgb_file, iteration) for e in entries],
                np.float32,
            )
            self.visualizer.render_final_sweep(poses, first_it)
            self.visualizer.to_video(self.out / "reconstruction.mp4")

        total_time = time.time() - t_start
        final_pose_file = self.out / f"poses_{iteration_id}.txt"
        shutil.copy(final_pose_file, self.out / "poses_final.txt")

        rates = registration_rates([e.confidence for e in entries], [500, 1000, 2000, 4000])
        report = (
            "Time (min) | Iterations | Reg. Rate @500 | @1000 | @2000 | @4000\n"
            f"{total_time / 60:.1f} {iteration} "
            f"{rates[0] * 100:.1f}% {rates[1] * 100:.1f}% {rates[2] * 100:.1f}% {rates[3] * 100:.1f}%\n"
        )
        _logger.info(report)
        _logger.info("Stage breakdown:\n%s", stage_report())

        if cfg.export_point_cloud:
            from acezero_tpu.export.point_cloud import export_point_cloud_from_network

            export_point_cloud_from_network(
                self.out / "pc_final.ply",
                self.encoder_params,
                head_params,
                self.head_cfg,
                self.scene,
                entries,
                dense=cfg.dense_point_cloud,
            )

        return {
            "entries": entries,
            "head_params": head_params,
            "focal_estimate": focal_estimate,
            "iterations": iteration,
            "registration_rates": rates,
            "rate_history": rate_history,
            "time_seconds": total_time,
            "report": report,
            "pose_file": self.out / "poses_final.txt",
        }
