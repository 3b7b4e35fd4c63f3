"""The mapping engine: fused scene-coordinate training on device.

TPU-native redesign of TrainerACE (/root/reference/ace_trainer.py): the whole
training loop — batch sampling from the device-resident patch buffer, head
forward (MXU matmuls), differentiable pose/focal refinement, reprojection
loss with validity masking, AdamW updates for head + pose refiner + focal,
LR schedule with dynamic early-stop cooldown — is one jitted lax.scan chunk.
The host only checks stopping conditions and logs between chunks.

Faithful semantics (value-level, per reference lines):
  - L1-norm pixel residual, hard-clamp mask at 1000 px, depth window
    [0.1, 1000] m (ace_trainer.py:545-576);
  - invalid pixels pulled toward a constant-depth (10 m) pseudo target
    through the unrefined K (ace_trainer.py:592-600), or toward GT scene
    coordinates when depth supervision exists (ace_trainer.py:601-609);
  - batch-inlier fraction (err < 10 px over full batch) feeds the cooldown
    trigger (ace_trainer.py:585-586);
  - pose updates gated by `pose_refinement_wait`, MLP refiner with additive
    0.1-weighted deltas + Gram-Schmidt orthonormalization
    (refine_poses.py:135-176);
  - single shared focal refined as a relative scale (1+g)
    (refine_calibration.py:21-53).

Deliberate deviations (documented, value-neutral at convergence):
  - bf16 compute + f32 master weights replaces fp16 + GradScaler;
  - per-step batch rows are drawn i.i.d. uniform from the buffer instead of
    an epoch-level random permutation (same distribution over the 8M-row
    buffer, no 8M-element permutation materialization per epoch);
  - a NaN loss skips the step instead of aborting the process.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from acezero_tpu.data.depth import seed_scene_coordinates
from acezero_tpu.data.scene import SceneData
from acezero_tpu.geometry.rotations import special_gramschmidt, special_procrustes
from acezero_tpu.models.head import HeadConfig, head_apply_flat, init_head_params
from acezero_tpu.models.posenet import init_posenet_params, posenet_apply
from acezero_tpu.training.buffer import BufferConfig, fill_training_buffer, next_bucket
from acezero_tpu.training.loss import ReproLossConfig, loss_hp, repro_loss_hp
from acezero_tpu.training.optim import AdamWState, adamw_init, adamw_update
from acezero_tpu.training.schedule import (
    ScheduleConfig,
    ScheduleState,
    init_schedule,
    schedule_hp,
    schedule_lr_hp,
    schedule_update_hp,
)

_logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 5120
    schedule: ScheduleConfig = field(default_factory=ScheduleConfig)
    loss: ReproLossConfig = field(default_factory=ReproLossConfig)
    depth_min: float = 0.1
    depth_max: float = 1000.0
    depth_target: float = 10.0
    repro_loss_hard_clamp: float = 1000.0
    cooldown_trigger_px_threshold: float = 10.0
    pose_refinement: str = "none"  # none | naive | mlp
    pose_refinement_weight: float = 0.1
    pose_refinement_lr: float = 0.001
    pose_refinement_wait: int = 0
    refinement_ortho: str = "gram-schmidt"  # gram-schmidt | procrustes
    refine_calibration: bool = False
    refine_calibration_lr: float = 0.001
    # EXPERIMENTAL (default off = reference semantics): normalize the
    # reprojection residual by the refined-focal ratio. Long-horizon focal
    # refinement is biased in BOTH parameterizations (measured round 4,
    # fixed GT poses + pretrained encoder, 8-view box scene): raw pixel
    # residuals scale ~linearly with f at the head's angular misfit floor,
    # so d(loss)/df < 0 persists at the TRUE focal and the estimate crosses
    # truth at ~250 steps then slides DOWN ~1.6%/1k steps indefinitely;
    # normalizing by (1+g) flips the sign (shrinking direction targets
    # u*/f is easier for the head to fit, so the estimate slides UP
    # faster). The true-focal valley is nearly flat between these nuisance
    # gradients — focal is weakly observable at long horizons. The
    # reference (refine_calibration.py:21-53, same AdamW/lr) has the same
    # raw-parameterization bias and bounds the exposure with short
    # early-stopped rounds + per-round re-anchoring through registration;
    # we keep those semantics.
    focal_loss_normalize: bool = False
    use_depth: bool = False
    use_fused_head: bool = False  # Pallas fused-MLP kernel for the head chain
    buffer_host_spill: bool = False  # `--training_buffer_cpu` equivalent
    chunk_steps: int = 500
    iterations_output: int = 500
    # Chunks dispatched back-to-back per host sync. On the axon relay a
    # dispatch returns instantly but FETCHING (the `int(state.iteration)`
    # stop check) costs a full round-trip (~2.4 s measured at chunk=500,
    # ~0.5 s device time) — per-chunk syncing quintuples the seed/mapping
    # stage wall-clock. Steps past the schedule's dynamic max_iterations
    # are no-ops inside the chunk (`active` gate), so over-dispatching by
    # up to sync_every_chunks-1 chunks only wastes bounded device time at
    # the end of a round.
    sync_every_chunks: int = 4
    # pose-table shape bucket: pad the per-image pose/focal tables to this
    # many rows (0 = auto next-power-of-two of the scene size). The
    # reconstruction loop maps a different confident SUBSET every round;
    # pinning the bucket to the full scene's bucket keeps every round on
    # one compiled train-chunk program (each distinct program pays a large
    # first-call cost on the shared-host relay).
    pose_table_bucket: int = 0


# TrainConfig fields that are RUNTIME scalars of the compiled train chunk
# (traced hp inputs), not part of its static jit key. Two configs differing
# only in these share one compiled program: the mapping round
# (tanh/1cyclepoly/wait 0) and the final refit (dyntanh/circle/wait 5000)
# collapse onto the same executable.
def train_hp(cfg: TrainConfig) -> dict:
    return {
        "sched": schedule_hp(cfg.schedule),
        "loss": loss_hp(cfg.loss),
        "pose_wait": np.int32(cfg.pose_refinement_wait),
        "pose_lr": np.float32(cfg.pose_refinement_lr),
        "calib_lr": np.float32(cfg.refine_calibration_lr),
    }


def _canonical_cfg(cfg: TrainConfig) -> TrainConfig:
    """The static jit key for a TrainConfig: runtime-scalar fields zeroed
    (their live values travel through `train_hp`), shape-affecting fields
    kept."""
    from dataclasses import replace

    return replace(
        cfg,
        schedule=ScheduleConfig(
            cooldown_buffer_size=cfg.schedule.cooldown_buffer_size
        ),
        loss=ReproLossConfig(),
        pose_refinement_wait=0,
        pose_refinement_lr=0.0,
        refine_calibration_lr=0.0,
    )


class TrainState(NamedTuple):
    head_params: dict
    head_opt: AdamWState
    pose_params: dict
    pose_opt: AdamWState
    focal_g: jax.Array  # scalar relative focal factor
    focal_opt: AdamWState
    sched: ScheduleState
    iteration: jax.Array
    nan_steps: jax.Array
    key: jax.Array


def _orthonormalize(cfg: TrainConfig, R: jax.Array) -> jax.Array:
    if cfg.refinement_ortho == "procrustes":
        return special_procrustes(R)
    return special_gramschmidt(R)


def _refined_w2c(cfg: TrainConfig, pose_params: dict, w2c_rows: jax.Array, img_idx: jax.Array):
    """Apply the pose-refinement strategy to (B, 3, 4) original w2c rows."""
    if cfg.pose_refinement == "none":
        return w2c_rows
    if cfg.pose_refinement == "naive":
        rows = pose_params["pose_buffer"][img_idx]  # (B, 3, 4)
        R = _orthonormalize(cfg, rows[:, :3, :3])
        return jnp.concatenate([R, rows[:, :3, 3:4]], axis=-1)
    # mlp: additive weighted delta predicted from the flattened pose
    flat = w2c_rows.reshape(-1, 12)
    delta = posenet_apply(pose_params, flat)
    updated = (flat + cfg.pose_refinement_weight * delta).reshape(-1, 3, 4)
    R = _orthonormalize(cfg, updated[:, :3, :3])
    return jnp.concatenate([R, updated[:, :3, 3:4]], axis=-1)


def _rotz(theta: jax.Array) -> jax.Array:
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(theta)
    o = jnp.ones_like(theta)
    return jnp.stack([c, -s, z, s, c, z, z, z, o], axis=-1).reshape(theta.shape + (3, 3))


def _loss_fn(
    trainable: tuple,
    batch: dict,
    ctx: dict,
    hp: dict,
    cfg: TrainConfig,
    head_cfg: HeadConfig,
    iteration: jax.Array,
):
    head_params, pose_params, focal_g = trainable

    if cfg.use_fused_head and "head_skip" not in head_params:
        from acezero_tpu.models.head import head_epilogue
        from acezero_tpu.ops.fused_head import fused_head_mlp, head_params_to_stack

        w_stack, b_stack, res_after = head_params_to_stack(head_params, head_cfg)
        hidden = fused_head_mlp(
            batch["features"].astype(jnp.bfloat16), w_stack, b_stack, res_after
        )
        pred = head_epilogue(head_params, head_cfg, hidden)  # (B, 3) f32
    else:
        pred = head_apply_flat(head_params, head_cfg, batch["features"])  # (B, 3) f32
    B = pred.shape[0]

    w2c_rows = ctx["poses_w2c"][batch["img_idx"]]  # (B, 3, 4) original poses
    w2c_ref = _refined_w2c(cfg, pose_params, w2c_rows, batch["img_idx"])

    # compose the augmentation rotation: T_eff = Rz(theta) @ T_refined
    Rz = _rotz(batch["theta"])  # (B, 3, 3)
    with jax.default_matmul_precision("highest"):
        R_eff = Rz @ w2c_ref[:, :3, :3]
        t_eff = (Rz @ w2c_ref[:, :3, 3:4])[..., 0]
        p_cam = (R_eff @ pred[..., None])[..., 0] + t_eff  # (B, 3)

    f_aug = ctx["focals"][batch["img_idx"]] * batch["scale"]  # unrefined
    f_ref = f_aug * (1.0 + focal_g) if cfg.refine_calibration else f_aug

    z = p_cam[:, 2]
    z_clamped = jnp.maximum(z, cfg.depth_min)
    u = f_ref * p_cam[:, 0] / z_clamped + ctx["ppx"]
    v = f_ref * p_cam[:, 1] / z_clamped + ctx["ppy"]
    err = jnp.abs(u - batch["target_px"][:, 0]) + jnp.abs(v - batch["target_px"][:, 1])

    invalid = (z < cfg.depth_min) | (err > cfg.repro_loss_hard_clamp) | (z > cfg.depth_max)

    if cfg.use_depth:
        target = batch["target_crds"]
        dist = jnp.linalg.norm(target - pred, axis=-1)
        avail = jnp.sum(jnp.abs(target), axis=-1) > 1e-5
        invalid = invalid | ((dist > 0.1) & avail)

    valid = ~invalid
    err_loss = err
    if cfg.refine_calibration and cfg.focal_loss_normalize:
        # see focal_loss_normalize: remove the residual-scale gradient of f,
        # keep the geometric one. Inlier counting stays on raw pixels.
        err_loss = err / (1.0 + focal_g)
    loss_valid = repro_loss_hp(hp["loss"], err_loss, valid, iteration)
    inliers = jnp.sum(valid & (err < cfg.cooldown_trigger_px_threshold))
    batch_inliers = inliers.astype(jnp.float32) / B

    if cfg.use_depth:
        inv_avail = (invalid & avail).astype(jnp.float32)
        loss_invalid = jnp.sum(dist * inv_avail)
    else:
        # constant-depth pseudo target through the *unrefined* intrinsics
        tx = (batch["target_px"][:, 0] - ctx["ppx"]) / f_aug * cfg.depth_target
        ty = (batch["target_px"][:, 1] - ctx["ppy"]) / f_aug * cfg.depth_target
        target_cam = jnp.stack([tx, ty, jnp.full_like(tx, cfg.depth_target)], axis=-1)
        loss_invalid = jnp.sum(
            jnp.sum(jnp.abs(target_cam - p_cam), axis=-1) * invalid.astype(jnp.float32)
        )

    loss = (loss_valid + loss_invalid) / B
    return loss, {"batch_inliers": batch_inliers}


def _train_chunk_impl(
    state: TrainState,
    buffer: dict,
    ctx: dict,
    hp: dict,
    cfg: TrainConfig,
    head_cfg: HeadConfig,
    num_steps: int,
    streamed: bool = False,
):
    """One jitted chunk of training steps.

    `streamed=False`: `buffer` holds the full (M, ...) device buffer and each
    step gathers a random batch. `streamed=True` (the host-spill path):
    `buffer` holds pre-gathered (num_steps, batch, ...) arrays shipped from
    host RAM, and step i consumes slice i.

    `hp` carries the runtime-scalar hyperparameters (train_hp); `cfg` must be
    the canonical config (_canonical_cfg) so recipes differing only in those
    scalars share this compiled program.
    """

    def _one_step(carry: TrainState, batch):
        active = carry.iteration < carry.sched.max_iterations
        key = carry.key

        trainable = (carry.head_params, carry.pose_params, carry.focal_g)
        (loss, aux), grads = jax.value_and_grad(_loss_fn, has_aux=True)(
            trainable, batch, ctx, hp, cfg, head_cfg, carry.iteration
        )
        g_head, g_pose, g_focal = grads

        finite = jnp.isfinite(loss)
        do_update = active & finite

        lr = schedule_lr_hp(hp["sched"], carry.sched, carry.iteration)
        head_params, head_opt = adamw_update(
            carry.head_params, g_head, carry.head_opt, lr, enabled=do_update
        )

        pose_enabled = (
            do_update
            & (carry.iteration > hp["pose_wait"])
            & jnp.asarray(cfg.pose_refinement != "none")
        )
        pose_params, pose_opt = adamw_update(
            carry.pose_params,
            g_pose,
            carry.pose_opt,
            jnp.asarray(hp["pose_lr"], jnp.float32),
            enabled=pose_enabled,
        )

        focal_g, focal_opt = adamw_update(
            carry.focal_g,
            g_focal,
            carry.focal_opt,
            jnp.asarray(hp["calib_lr"], jnp.float32),
            enabled=do_update & jnp.asarray(cfg.refine_calibration),
        )

        sched_new = schedule_update_hp(hp["sched"], carry.sched, carry.iteration, aux["batch_inliers"])
        sched = jax.tree.map(lambda n, o: jnp.where(active, n, o), sched_new, carry.sched)

        new_state = TrainState(
            head_params=head_params,
            head_opt=head_opt,
            pose_params=pose_params,
            pose_opt=pose_opt,
            focal_g=focal_g,
            focal_opt=focal_opt,
            sched=sched,
            iteration=carry.iteration + jnp.where(active, 1, 0),
            nan_steps=carry.nan_steps + jnp.where(active & ~finite, 1, 0),
            key=key,
        )
        stats = {
            "loss": jnp.where(active, loss, jnp.nan),
            "batch_inliers": aux["batch_inliers"],
            "lr": lr,
            "active": active,
        }
        return new_state, stats

    if streamed:
        return jax.lax.scan(_one_step, state, buffer, length=num_steps)

    M = buffer["features"].shape[0]

    def step(carry: TrainState, _):
        key, k_batch = jax.random.split(carry.key)
        idx = jax.random.randint(k_batch, (cfg.batch_size,), 0, M)
        batch = {k: v[idx] for k, v in buffer.items()}
        return _one_step(carry._replace(key=key), batch)

    return jax.lax.scan(step, state, None, length=num_steps)


_train_chunk_jit = jax.jit(
    _train_chunk_impl, static_argnames=("cfg", "head_cfg", "num_steps", "streamed")
)


def _train_chunk(
    state: TrainState,
    buffer: dict,
    ctx: dict,
    cfg: TrainConfig,
    head_cfg: HeadConfig,
    num_steps: int,
    streamed: bool = False,
):
    """Dispatch one training chunk, routing the runtime-scalar fields of
    `cfg` through traced hp inputs so configs differing only in schedule/
    loss/refinement scalars share ONE compiled program (the mapping and
    refit recipes, every reconstruction round)."""
    return _train_chunk_jit(
        state,
        buffer,
        ctx,
        train_hp(cfg),
        _canonical_cfg(cfg),
        head_cfg,
        num_steps,
        streamed,
    )


class MappingTrainer:
    """Drives one mapping round: buffer fill + chunked fused training.

    The in-process equivalent of `TrainerACE(options).train()`
    (/root/reference/train_ace.py:240-241).

    Shape bucketing: the reconstruction loop maps a different confident
    subset every round, which would change the buffer row count and pose
    table size — and therefore recompile every jitted chunk each round. Both
    are padded up to power-of-two buckets (rows repeat cyclically, pose/
    focal tables pad with identities that no row references), so the whole
    multi-round loop reuses a handful of compiled programs.
    """

    def __init__(
        self,
        scene: SceneData,
        encoder_params: dict,
        head_cfg: HeadConfig,
        cfg: TrainConfig,
        buffer_cfg: BufferConfig,
        head_params: dict | None = None,
        base_seed: int = 2089,
        mesh=None,
        frame_callback=None,
    ):
        self.mesh = mesh  # jax.sharding.Mesh with a 'data' axis, or None
        # optional `(iteration, poses_w2c (N,3,4) np) -> None` visualization
        # hook, fired every iterations_output steps like the reference's
        # render_mapping_frame (/root/reference/ace_trainer.py:675-679)
        self.frame_callback = frame_callback
        self.scene = scene
        self.cfg = cfg
        self.buffer_cfg = buffer_cfg
        self.head_cfg = head_cfg
        self.encoder_params = encoder_params
        self.key = jax.random.PRNGKey(base_seed)

        mean = scene.mean_camera_center()
        if head_params is None:
            self.key, k_head = jax.random.split(self.key)
            head_params = init_head_params(k_head, head_cfg, jnp.asarray(mean))
        self.head_params_init = head_params

        if cfg.refine_calibration:
            if not np.allclose(scene.focals_orig, scene.focals_orig[0], rtol=1e-5):
                raise ValueError(
                    "All images must share one focal length for calibration refinement"
                )

        # world-to-camera pose table (the refiner's anchor poses), padded to
        # a power-of-two image count so jit shapes bucket across rounds
        w2c = np.linalg.inv(scene.poses_c2w.astype(np.float64)).astype(np.float32)
        n_img = len(scene)
        n_pad = max(next_bucket(n_img, 8), cfg.pose_table_bucket)
        self._pose_pad = n_pad
        w2c_pad = np.tile(np.eye(4, dtype=np.float32)[None], (n_pad, 1, 1))
        w2c_pad[:n_img] = w2c
        focals_pad = np.ones(n_pad, np.float32)
        focals_pad[:n_img] = scene.focals_canvas
        ppx, ppy = scene.principal_point
        self.ctx = {
            "poses_w2c": jnp.asarray(w2c_pad[:, :3, :4]),
            "focals": jnp.asarray(focals_pad),
            "ppx": jnp.asarray(ppx, jnp.float32),
            "ppy": jnp.asarray(ppy, jnp.float32),
        }

    # ------------------------------------------------------------------

    def _seed_target_maps(self) -> np.ndarray | None:
        if not self.cfg.use_depth:
            return None
        hc, wc = self.scene.canvas_hw
        hs, ws = hc // 8, wc // 8
        maps = np.zeros((len(self.scene), hs, ws, 3), np.float32)
        for idx, depth_canvas in self.scene.depth_maps.items():
            maps[idx] = seed_scene_coordinates(
                depth_canvas,
                float(self.scene.focals_canvas[idx]),
                self.scene.poses_c2w[idx],
            )
        return maps

    def build_buffer(self, k_fill: jax.Array, shard: bool = True):
        """Fill (and optionally mesh-shard) the patch buffer.

        The single construction path shared by normal mapping rounds and the
        vmapped seed-parallel stage (which stacks S un-sharded buffers and
        shards the row axis under the seed axis instead)."""
        buffer = fill_training_buffer(
            k_fill,
            self.encoder_params,
            self.scene.images.canvases,
            self.scene.images.sizes,
            self.buffer_cfg,
            target_maps=self._seed_target_maps(),
            host_spill=self.cfg.buffer_host_spill,
            pad_rows_to_bucket=True,
            device_view=self.scene.images.device_view(),
            target_rows_bucket=self._pose_pad,
        )
        if shard and self.mesh is not None and not self.cfg.buffer_host_spill:
            # shard the HBM hog across the mesh; params/state replicate and
            # XLA inserts the batch-gather + grad-reduce collectives (GSPMD)
            from acezero_tpu.parallel.mesh import replicate, shard_rows

            n_rows = buffer["features"].shape[0]
            aligned = (n_rows // self.mesh.devices.size) * self.mesh.devices.size
            buffer = jax.tree.map(lambda a: a[:aligned], buffer)
            buffer = shard_rows(buffer, self.mesh)
            self.ctx = replicate(self.ctx, self.mesh)
        return buffer

    def build_state(self, k_train: jax.Array, replicate_on_mesh: bool = True) -> TrainState:
        """Fresh optimizer/schedule/refiner state for this trainer's config."""
        cfg = self.cfg
        if cfg.pose_refinement == "naive":
            pose_params = {"pose_buffer": self.ctx["poses_w2c"]}
        elif cfg.pose_refinement == "mlp":
            self.key, k_pose = jax.random.split(self.key)
            pose_params = init_posenet_params(k_pose)
        else:
            pose_params = {}

        state = TrainState(
            head_params=self.head_params_init,
            head_opt=adamw_init(self.head_params_init),
            pose_params=pose_params,
            pose_opt=adamw_init(pose_params),
            focal_g=jnp.asarray(0.0, jnp.float32),
            focal_opt=adamw_init(jnp.asarray(0.0, jnp.float32)),
            sched=init_schedule(cfg.schedule),
            iteration=jnp.asarray(0, jnp.int32),
            nan_steps=jnp.asarray(0, jnp.int32),
            key=k_train,
        )
        if replicate_on_mesh and self.mesh is not None:
            from acezero_tpu.parallel.mesh import replicate

            state = replicate(state, self.mesh)
        return state

    def train(self) -> dict:
        t0 = time.time()
        self.key, k_fill, k_train = jax.random.split(self.key, 3)

        buffer = self.build_buffer(k_fill)
        n_rows = buffer["features"].shape[0]
        fill_time = time.time() - t0
        _logger.info("Filled training buffer: %d rows in %.1fs", n_rows, fill_time)

        cfg = self.cfg
        state = self.build_state(k_train)

        train_start = time.time()
        last_logged = 0
        # NOTE: chunk length is cfg.chunk_steps VERBATIM, not clamped to the
        # schedule budget — the scan length is part of the compiled program
        # shape, and a constant chunk lets every round/config reuse one
        # compiled program (tiny test configs pass a small chunk_steps
        # explicitly instead)
        chunk_steps = cfg.chunk_steps
        # The host-spill path gathers each chunk's batches on the host, and
        # the visualizer callback needs per-chunk poses — both force a sync
        # per chunk. The device-buffer path pipelines sync_every_chunks
        # dispatches per round-trip (see the TrainConfig field note).
        sync_chunks = max(1, cfg.sync_every_chunks)
        if cfg.buffer_host_spill or self.frame_callback is not None:
            sync_chunks = 1
        spill_rng = np.random.default_rng(int(jax.random.randint(k_train, (), 0, 2**31 - 1)))
        while True:
            for _ in range(sync_chunks):
                if cfg.buffer_host_spill:
                    idx = spill_rng.integers(0, n_rows, (chunk_steps, cfg.batch_size))
                    batches = {
                        k: jnp.asarray(v[idx]).astype(
                            jnp.bfloat16 if k == "features" else v.dtype
                        )
                        for k, v in buffer.items()
                    }
                    state, stats = _train_chunk(
                        state, batches, self.ctx, cfg, self.head_cfg, chunk_steps,
                        streamed=True,
                    )
                else:
                    state, stats = _train_chunk(
                        state, buffer, self.ctx, cfg, self.head_cfg, chunk_steps
                    )
            # one batched fetch = one relay round-trip for the stop check
            it, max_it = (
                int(v) for v in jax.device_get((state.iteration, state.sched.max_iterations))
            )
            if it - last_logged >= cfg.iterations_output or it >= max_it:
                active, losses, inl = jax.device_get(
                    (stats["active"], stats["loss"], stats["batch_inliers"])
                )
                if active.any():
                    _logger.info(
                        "Iteration %6d|%6d, loss %.1f, batch inliers %.1f%%, time %.0fs",
                        it,
                        max_it,
                        float(losses[active][-1]),
                        float(inl[active][-1]) * 100,
                        time.time() - t0,
                    )
                if self.frame_callback is not None:
                    n_img = len(self.scene)
                    poses = np.asarray(self.current_poses(state))[:n_img]
                    self.frame_callback(it, poses)
                last_logged = it
            if it >= max_it:
                break
        train_time = time.time() - train_start

        if int(state.nan_steps) > 0:
            _logger.warning("Skipped %d NaN-loss steps", int(state.nan_steps))

        poses_w2c = self.current_poses(state)
        focal_orig = float(self.scene.focals_orig[0]) * (1.0 + float(state.focal_g))

        _logger.info(
            "Mapping done: %d iterations (buffer %.1fs, train %.1fs)",
            int(state.iteration),
            fill_time,
            train_time,
        )
        return {
            "state": state,
            "head_params": state.head_params,
            "poses_w2c": poses_w2c,  # (N, 3, 4) refined world-to-camera
            "focal_orig": focal_orig if cfg.refine_calibration else None,
            "iterations": int(state.iteration),
            "fill_time": fill_time,
            "train_time": train_time,
        }

    def current_poses(self, state: TrainState) -> np.ndarray:
        """All refined world-to-camera poses (N, 3, 4), like
        PoseRefiner.get_all_current_poses (refine_poses.py:184-210)."""
        w2c_rows = self.ctx["poses_w2c"]
        idx = jnp.arange(w2c_rows.shape[0])
        refined = _refined_w2c(self.cfg, state.pose_params, w2c_rows, idx)
        return np.asarray(refined)[: len(self.scene)]
