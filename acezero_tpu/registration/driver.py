"""Registration stage driver: relocalize every frame against a scene map.

In-process, batched equivalent of the reference register_mapping.py CLI
(/root/reference/register_mapping.py:199-276): normalized (unaugmented)
frames go through encoder + head to scene coordinates, then through the
vectorized RANSAC registrar — encoder, head, and registrar fused into one
jitted program per frame chunk, instead of fp16 forward + per-frame C++
RANSAC on the CPU.

Outputs per frame: cam-to-world pose, inlier-count confidence, and the
original-pixel focal length — exactly the pose-file currency of the ACE0
loop (the caller writes `poses_<session>.txt` with the *inverted* pose,
reference register_mapping.py:273-276).
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from acezero_tpu.data.augment import normalize_images
from acezero_tpu.data.canvas_geom import content_mask
from acezero_tpu.data.scene import SceneData
from acezero_tpu.geometry.projection import get_pixel_grid
from acezero_tpu.io.pose_files import PoseFileEntry
from acezero_tpu.models.head import HeadConfig, head_apply_image
from acezero_tpu.models.encoder import encoder_apply
from acezero_tpu.registration.ransac import RansacConfig, estimate_pose

_logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class RegistrationConfig:
    # NOTE: the reference defaults to 1e6 *lazy* hypothesis retries; tries
    # here are an eagerly batched dimension, so the default matches the
    # orchestrated 16 (64 hyps x 1000 tries would materialize multi-GB
    # candidate tensors per chunk).
    ransac: RansacConfig = field(default_factory=lambda: RansacConfig(hypotheses=64, max_tries=16))
    confidence_threshold: float = 1000.0  # "successfully registered" bar for reporting
    max_estimates: int = -1
    frame_chunk: int = 64
    base_seed: int = 1305
    # Two-tier refit budget: the vmapped refineHyp while_loop runs to the
    # SLOWEST lane of a chunk, so one stubborn frame makes all 64 lanes pay
    # the full 100-step cap (measured 16-31s/chunk on noisy maps, round-2
    # notes). Pass 1 caps every frame at `refit_tier1` steps; frames whose
    # loop was cut short while still growing re-run densely packed with the
    # full budget AND THE SAME PER-FRAME PRNG KEY — the program is
    # deterministic, so the rerun walks the identical refinement trajectory
    # and the two-tier result is bit-equal to a single full-budget pass.
    # <=0 disables tiering.
    refit_tier1: int = 16


def _host_keys(rng: np.random.Generator, shape: tuple) -> np.ndarray:
    """Threefry key DATA built on the host: independent uint32 pairs are
    valid jax PRNG keys, and building them with numpy avoids dispatching the
    eager PRNGKey/_threefry_split programs (each distinct program costs a
    relay cache-read/compile round trip per process)."""
    return rng.integers(0, 2**32, size=shape + (2,), dtype=np.uint32)


def _canvas_prologue(images_u8, sizes, subsample: int):
    """Normalize, zero the padding, and derive masks/grid/pp for a chunk.

    Single source of the canvas-content geometry (shared with the training
    path through data.canvas_geom.content_mask — the float-bound variant
    marked one padding row valid whenever the centering margin was odd)."""
    B, H, W = images_u8.shape
    images = normalize_images(images_u8)
    mask = content_mask(H, W, sizes)
    images = jnp.where(mask[..., None], images, 0.0)
    off = subsample // 2
    mask_lr = mask[:, off::subsample, off::subsample]
    grid = get_pixel_grid(H // subsample, W // subsample, subsample)
    ppx = jnp.full((B,), W / 2.0, jnp.float32)
    ppy = jnp.full((B,), H / 2.0, jnp.float32)
    return images, mask_lr, grid, ppx, ppy


# NOTE on program structure: scene-coordinate inference (encoder + head)
# and the RANSAC solve are SEPARATE jitted programs with the (tiny)
# coordinate maps materialized between them. Fusing them into one program
# looks natural but interacts pathologically with the registrar's
# refinement lax.while_loop — XLA sinks recomputation into the loop and a
# 60-frame chunk goes from ~2s to ~80s when maps are noisy enough to hit
# the refit cap (measured on TPU v5e; see round-2 notes). The split costs
# one HBM round-trip of (B, h, w, 3) floats ≈ 3 MB per chunk.


@partial(jax.jit, static_argnames=("head_cfg", "subsample"))
def _coords_chunk_multi(
    encoder_params,
    head_params_stacked,  # pytree with leading head axis S
    head_cfg: HeadConfig,
    images_u8,
    sizes,
    subsample: int = 8,
):
    """Scene coordinates of one frame chunk under S heads (shared encoder).

    The seed-scoring stage registers against all candidate seed maps for
    one encoder pass (reference scores seeds in separate processes,
    ace_zero_util.py:242-259). Returns ((S, B, h, w, 3) coords, (B, h, w)
    mask)."""
    images, mask_lr, grid, ppx, ppy = _canvas_prologue(images_u8, sizes, subsample)
    feats = encoder_apply(encoder_params, images)
    coords = jax.vmap(lambda hp: head_apply_image(hp, head_cfg, feats))(
        head_params_stacked
    )
    return coords, mask_lr


@partial(jax.jit, static_argnames=("ransac_cfg",))
def _ransac_chunk_jit(
    coords,  # (B, h, w, 3)
    mask_lr,  # (B, h, w)
    grid,  # (h, w, 2)
    focals,  # (B,)
    ppx,
    ppy,
    keys,  # (B, 2)
    max_steps,  # () int32 RUNTIME refineHyp cap
    ransac_cfg: RansacConfig,
):
    return jax.vmap(
        lambda k, sc, m, f, px_, py_: estimate_pose(
            k, sc, m, grid, f, px_, py_, ransac_cfg, max_steps
        )
    )(keys, coords, mask_lr, focals, ppx, ppy)


def _canonical_ransac(cfg: RansacConfig) -> RansacConfig:
    """Static jit key for a RansacConfig: the refineHyp cap travels as a
    runtime scalar, so budgets differing only in it (tier-1/tier-2/scoring)
    share ONE compiled program — every distinct program pays a large
    first-call cost on the shared-host relay."""
    from dataclasses import replace as _replace

    return _replace(cfg, refinement_steps=0)


def _ransac_chunk(coords, mask_lr, grid, focals, ppx, ppy, keys, ransac_cfg, max_steps=None):
    steps = ransac_cfg.refinement_steps if max_steps is None else max_steps
    return _ransac_chunk_jit(
        coords,
        mask_lr,
        grid,
        focals,
        ppx,
        ppy,
        keys,
        np.int32(steps),
        _canonical_ransac(ransac_cfg),
    )


def register_frames_multi(
    encoder_params,
    head_params_list: list,
    head_cfg: HeadConfig,
    scene: SceneData,
    cfg: RegistrationConfig,
    mesh=None,
) -> list[list[PoseFileEntry]]:
    """Register frames against several heads sharing one encoder pass.

    Returns one entry list per head (same frame order). With a mesh, the
    frame axis shards across devices (heads are tiny and replicate) — seed
    scoring is a full-dataset registration x S heads, so this is the same
    data-parallel layout as `register_frames`."""
    S = len(head_params_list)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *head_params_list)
    n = len(scene)
    order = np.random.default_rng(cfg.base_seed).permutation(n)
    if cfg.max_estimates > 0:
        order = order[: cfg.max_estimates]

    key_rng = np.random.default_rng(cfg.base_seed + 0x9E37)
    images, sizes = scene.images.canvases, scene.images.sizes
    chunk = cfg.frame_chunk
    if mesh is not None:
        chunk = -(-chunk // mesh.devices.size) * mesh.devices.size

    def _maybe_shard(tree):
        if mesh is None:
            return tree
        from acezero_tpu.parallel.mesh import shard_rows

        return shard_rows(tree, mesh)
    H, W = scene.images.canvas_hw
    sub8 = 8
    grid = get_pixel_grid(H // sub8, W // sub8, sub8)
    results: list[list[PoseFileEntry]] = [[] for _ in range(S)]
    t0 = time.time()
    # dispatch-all-then-fetch (async relay pipelining; same pattern and
    # rationale as register_frames' pass-1 loop below)
    starts = range(0, len(order), chunk)
    all_keys = _host_keys(key_rng, (len(starts), S, chunk))
    pending = []
    for ci, c0 in enumerate(starts):
        idx = order[c0 : c0 + chunk]
        pad = chunk - len(idx)
        idx_p = np.concatenate([idx, np.repeat(idx[-1:], pad)]) if pad else idx
        coords, mask_lr = _coords_chunk_multi(
            encoder_params,
            stacked,
            head_cfg,
            _maybe_shard(images[idx_p]),
            _maybe_shard(sizes[idx_p]),
        )
        focals_c = _maybe_shard(np.asarray(scene.focals_canvas[idx_p], np.float32))
        ppx_c = np.full((chunk,), W / 2.0, np.float32)
        ppy_c = np.full((chunk,), H / 2.0, np.float32)
        # one head per solve: each (chunk, head) pair reuses the SAME
        # compiled registrar program as normal registration instead of a
        # separate S-stacked program (same device FLOPs; one fewer program
        # paying the relay's first-call cost)
        outs = [
            _ransac_chunk(
                coords[s_i], mask_lr, grid, focals_c, ppx_c, ppy_c,
                all_keys[ci, s_i], cfg.ransac,
            )
            for s_i in range(S)
        ]
        pending.append((idx, outs))
    for idx, lazy_outs in pending:
        for s_i, lazy_out in enumerate(lazy_outs):
            out = jax.device_get(lazy_out)
            poses = out["pose_c2w"].astype(np.float64)  # (B, 4, 4)
            confs = out["inlier_count"]
            for j, i in enumerate(idx):
                results[s_i].append(
                    PoseFileEntry(
                        rgb_file=scene.rgb_files[i],
                        pose_w2c=np.linalg.inv(poses[j]),
                        focal_length=float(scene.focals_orig[i]),
                        confidence=float(confs[j]),
                    )
                )
    _logger.info(
        "Registered %d frames x %d maps in %.1fs", len(order), S, time.time() - t0
    )
    return results


@partial(jax.jit, static_argnames=("head_cfg", "subsample"))
def _coords_chunk(
    encoder_params,
    head_params,
    head_cfg: HeadConfig,
    images_u8,  # (B, H, W)
    sizes,  # (B, 2)
    subsample: int = 8,
):
    images, mask_lr, grid, ppx, ppy = _canvas_prologue(images_u8, sizes, subsample)
    feats = encoder_apply(encoder_params, images)
    coords = head_apply_image(head_params, head_cfg, feats)  # (B, h, w, 3)
    return coords, mask_lr


@partial(jax.jit, static_argnames=("head_cfg", "subsample"))
def _coords_chunk_from_root(
    encoder_params,
    head_params,
    head_cfg: HeadConfig,
    canvases_full,  # (N, H, W) device-resident root canvases
    sizes_full,  # (N, 2)
    idx,  # (B,) indices into the root
    subsample: int = 8,
):
    """Single-device chunk path gathering frames from the scene's one-time
    canvas upload (no per-round host->device image traffic)."""
    return _coords_chunk.__wrapped__(
        encoder_params,
        head_params,
        head_cfg,
        canvases_full[idx],
        sizes_full[idx],
        subsample,
    )


def register_frames(
    encoder_params,
    head_params,
    head_cfg: HeadConfig,
    scene: SceneData,
    cfg: RegistrationConfig,
    focal_override_orig: float | None = None,
    mesh=None,
) -> list[PoseFileEntry]:
    """Register every frame of the scene; returns pose-file entries.

    focal_override_orig: optional original-pixel focal length replacing the
    scene's per-frame focals (the orchestrator passes the refined estimate,
    reference ace_zero.py:296-305).
    """
    n = len(scene)
    order = np.random.default_rng(cfg.base_seed).permutation(n)
    if cfg.max_estimates > 0:
        order = order[: cfg.max_estimates]

    if focal_override_orig is not None:
        focals_canvas = focal_override_orig * scene.images.scale_factors
        focals_orig = np.full(n, focal_override_orig, np.float32)
    else:
        focals_canvas = scene.focals_canvas
        focals_orig = scene.focals_orig

    key_rng = np.random.default_rng(cfg.base_seed + 0x9E37)
    images = scene.images.canvases
    sizes = scene.images.sizes

    chunk = cfg.frame_chunk
    if mesh is not None:
        # frames shard across the mesh: round the chunk up to a multiple of
        # the device count and device_put the per-chunk inputs row-sharded
        chunk = -(-chunk // mesh.devices.size) * mesh.devices.size

    def _maybe_shard(tree):
        if mesh is None:
            return tree
        from acezero_tpu.parallel.mesh import shard_rows

        return shard_rows(tree, mesh)

    entries: list[PoseFileEntry] = []
    failed_idx: list[int] = []
    capped_idx: list[int] = []
    frame_key: dict[int, np.ndarray] = {}
    entry_slot: dict[int, int] = {}
    t0 = time.time()

    full_steps = cfg.ransac.refinement_steps
    tiered = 0 < cfg.refit_tier1 < full_steps
    pass1_steps = cfg.refit_tier1 if tiered else full_steps

    canv_dev = sizes_dev = root_idx = None
    if mesh is None:
        canv_dev, sizes_dev, root_idx = scene.images.device_view()

    H, W = scene.images.canvas_hw
    sub8 = 8
    grid = get_pixel_grid(H // sub8, W // sub8, sub8)

    def _run_chunk(idx_p, keys, ransac_cfg, max_steps):
        chunk_n = len(idx_p)
        if mesh is None:
            coords, mask_lr = _coords_chunk_from_root(
                encoder_params,
                head_params,
                head_cfg,
                canv_dev,
                sizes_dev,
                np.asarray(root_idx[idx_p], np.int32),
            )
            focals_c = np.asarray(focals_canvas[idx_p], np.float32)
        else:
            # mesh path: per-chunk upload + row sharding (the root array
            # lives on one device; sharded registration feeds host slices)
            coords, mask_lr = _coords_chunk(
                encoder_params,
                head_params,
                head_cfg,
                _maybe_shard(images[idx_p]),
                _maybe_shard(sizes[idx_p]),
            )
            focals_c = _maybe_shard(np.asarray(focals_canvas[idx_p], np.float32))
            keys = _maybe_shard(keys)
        return _ransac_chunk(
            coords,
            mask_lr,
            grid,
            focals_c,
            np.full((chunk_n,), W / 2.0, np.float32),
            np.full((chunk_n,), H / 2.0, np.float32),
            keys,
            ransac_cfg,
            max_steps,
        )

    # Dispatch every pass-1 chunk before fetching any result: relay dispatch
    # is async, so chunk i+1 executes while chunk i's (tiny) outputs stream
    # back, instead of paying a full round-trip of dead time per chunk. All
    # chunk keys come from ONE up-front split+fetch — a per-chunk
    # np.asarray(keys) would block on everything previously enqueued.
    starts = range(0, len(order), chunk)
    all_keys = _host_keys(key_rng, (len(starts), chunk))
    pending = []
    for ci, c0 in enumerate(starts):
        idx = order[c0 : c0 + chunk]
        pad = chunk - len(idx)
        idx_p = np.concatenate([idx, np.repeat(idx[-1:], pad)]) if pad else idx
        keys = all_keys[ci]
        pending.append((idx, keys, _run_chunk(idx_p, keys, cfg.ransac, pass1_steps)))
    for idx, keys_np, lazy_out in pending:
        out = jax.device_get(lazy_out)
        poses_c2w = out["pose_c2w"].astype(np.float64)
        confs = out["inlier_count"]
        valids = out["valid"]
        caps = out["hit_cap"]
        for j, i in enumerate(idx):
            if not valids[j]:
                failed_idx.append(int(i))
            if tiered and caps[j]:
                capped_idx.append(int(i))
                frame_key[int(i)] = keys_np[j]
            entry_slot[int(i)] = len(entries)
            entries.append(
                PoseFileEntry(
                    rgb_file=scene.rgb_files[i],
                    pose_w2c=np.linalg.inv(poses_c2w[j]),
                    focal_length=float(focals_orig[i]),
                    confidence=float(confs[j]),
                )
            )

    # tier-2: frames the short budget cut off mid-growth re-run densely
    # packed with the full refineHyp cap and their original keys (bit-equal
    # to a single full-budget pass; see refit_tier1 note above)
    if capped_idx:
        _logger.info(
            "Refit tier 2: %d/%d frames re-run at the %d-step cap.",
            len(capped_idx), len(order), full_steps,
        )
        carr = np.asarray(capped_idx)
        pending = []
        for c0 in range(0, len(carr), chunk):
            idx = carr[c0 : c0 + chunk]
            pad = chunk - len(idx)
            idx_p = np.concatenate([idx, np.repeat(idx[-1:], pad)]) if pad else idx
            keys = np.stack([frame_key[int(i)] for i in idx_p])
            pending.append((idx, _run_chunk(idx_p, keys, cfg.ransac, full_steps)))
        for idx, lazy_out in pending:
            out = jax.device_get(lazy_out)
            poses_c2w = out["pose_c2w"].astype(np.float64)
            confs = out["inlier_count"]
            for j, i in enumerate(idx):
                slot = entry_slot[int(i)]
                entries[slot] = PoseFileEntry(
                    rgb_file=entries[slot].rgb_file,
                    pose_w2c=np.linalg.inv(poses_c2w[j]),
                    focal_length=entries[slot].focal_length,
                    confidence=float(confs[j]),
                )

    # total-sampling-failure fallback: frames where no minimal set validated
    # across hypotheses x max_tries draws get one more pass with a 4x try
    # budget (the reference keeps drawing lazily up to 1M times,
    # /root/reference/dsacstar/dsacstar_util.h:158-221; eager batching makes
    # that prohibitive up front but cheap as a retry for the rare failures)
    if failed_idx and cfg.ransac.max_tries < 256:
        from dataclasses import replace as _replace

        retry_cfg = _replace(cfg.ransac, max_tries=cfg.ransac.max_tries * 4)
        _logger.info(
            "Retrying %d total-sampling-failure frames with %d tries.",
            len(failed_idx), retry_cfg.max_tries,
        )
        farr = np.asarray(failed_idx)
        r_starts = range(0, len(farr), chunk)
        retry_keys = _host_keys(key_rng, (len(r_starts), chunk))
        pending = []
        for ci, c0 in enumerate(r_starts):
            idx = farr[c0 : c0 + chunk]
            pad = chunk - len(idx)
            idx_p = np.concatenate([idx, np.repeat(idx[-1:], pad)]) if pad else idx
            pending.append((idx, _run_chunk(idx_p, retry_keys[ci], retry_cfg, full_steps)))
        for idx, lazy_out in pending:
            out = jax.device_get(lazy_out)
            poses_c2w = out["pose_c2w"].astype(np.float64)
            confs = out["inlier_count"]
            valids = out["valid"]
            for j, i in enumerate(idx):
                if valids[j]:
                    slot = entry_slot[int(i)]
                    entries[slot] = PoseFileEntry(
                        rgb_file=entries[slot].rgb_file,
                        pose_w2c=np.linalg.inv(poses_c2w[j]),
                        focal_length=entries[slot].focal_length,
                        confidence=float(confs[j]),
                    )
    dt = time.time() - t0
    n_success = sum(e.confidence > cfg.confidence_threshold for e in entries)
    _logger.info(
        "Registered %d frames in %.1fs (%.1f frames/s); %d above confidence %.0f",
        len(entries), dt, len(entries) / max(dt, 1e-9), n_success, cfg.confidence_threshold,
    )
    return entries
