"""Device-resident training patch buffer (the 8M-patch feature store).

TPU-native redesign of the reference buffer fill
(/root/reference/ace_trainer.py:293-452). Differences by design:

  - the whole pipeline (augment -> encoder -> mask-weighted sampling ->
    scatter) is one jitted chunk program; no CPU dataloader workers;
  - the buffer is structure-of-arrays in HBM and is written in place via
    donated dynamic-update-slices;
  - per-row storage keeps only what varies per *sample* (features, target
    pixel, target coords, image index, augmentation theta/scale). Poses and
    base focals are gathered at train time from small per-image tables
    instead of being replicated into every row (the reference stores 4x4+3x4
    poses and two 3x3 intrinsics per row — ~50 extra floats that we fold
    into 3 scalars + an index), cutting buffer HBM roughly in half.

The fill honors the reference budget: `passes` complete passes over the
dataset with fresh augmentations (max 10), `samples_per_image` (1024)
mask-weighted draws with replacement per image, capped at
`max_buffer_size` total rows (8M).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from acezero_tpu.data.augment import augment_batch, warp_target_map
from acezero_tpu.models.encoder import encoder_apply


@dataclass(frozen=True)
class BufferConfig:
    max_buffer_size: int = 8_000_000
    samples_per_image: int = 1024
    max_dataset_passes: int = 10
    use_aug: bool = True
    aug_rotation: float = 15.0
    aug_scale_max: float = 1.5
    # brightness/contrast jitter half-range (reference CamLocDataset
    # aug_black_white, dataset.py:61,148; default 0.1 -> [0.9, 1.1])
    aug_black_white: float = 0.1
    image_chunk: int = 32  # images encoded per jitted chunk
    subsample: int = 8


def plan_buffer_size(cfg: BufferConfig, num_images: int) -> tuple[int, int]:
    """(total_rows, passes) under the reference budget
    (ace_trainer.py:326-327,351)."""
    per_pass = num_images * cfg.samples_per_image
    passes = min(cfg.max_dataset_passes, max(1, -(-cfg.max_buffer_size // per_pass)))
    total = min(cfg.max_buffer_size, passes * per_pass)
    return total, passes


@partial(jax.jit, static_argnames=("cfg",))
def _fill_chunk(
    encoder_params,
    images_u8,  # (B, H, W)
    sizes,  # (B, 2)
    target_maps,  # (B, hs, ws, 3) world-coordinate targets (zeros if unused)
    key,
    cfg: BufferConfig,
):
    """Process one image chunk: augment, encode, sample patches.

    Returns per-sample rows: features (B*S, C) bf16, cell pixel positions
    (B*S, 2), target coords (B*S, 3), thetas/scales (B,)... flattened.
    """
    B, H, W = images_u8.shape
    S = cfg.samples_per_image
    sub = cfg.subsample
    hs, ws = H // sub, W // sub

    k_aug, k_sample = jax.random.split(key)
    aug = augment_batch(
        k_aug,
        images_u8,
        sizes,
        aug_rotation_deg=cfg.aug_rotation if cfg.use_aug else 0.0,
        aug_scale_min=1.0 / cfg.aug_scale_max,
        aug_scale_max=cfg.aug_scale_max,
        aug_black_white=cfg.aug_black_white,
        enabled=cfg.use_aug,
    )

    feats = encoder_apply(encoder_params, aug["images"])  # (B, hs, ws, C)

    # feature-resolution mask: nearest sample at each cell center
    off = sub // 2
    mask_lr = aug["masks"][:, off::sub, off::sub]  # (B, hs, ws)

    # mask-weighted multinomial with replacement (ace_trainer.py:419-426)
    logits = jnp.where(mask_lr.reshape(B, hs * ws), 0.0, -jnp.inf)
    # guard: an all-masked image samples uniformly (its rows are garbage but
    # such frames don't occur in practice — reference `continue`s on them)
    any_valid = jnp.any(mask_lr.reshape(B, hs * ws), axis=-1, keepdims=True)
    logits = jnp.where(any_valid, logits, 0.0)
    cell_idx = jax.random.categorical(k_sample, logits[:, None, :], shape=(B, S))  # (B, S)

    feats_flat = feats.reshape(B, hs * ws, -1)
    rows_feat = jnp.take_along_axis(feats_flat, cell_idx[..., None], axis=1)  # (B, S, C)

    # full-res pixel position of each sampled cell (reference pixel grid)
    cy = (cell_idx // ws).astype(jnp.float32)
    cx = (cell_idx % ws).astype(jnp.float32)
    px = jnp.stack([(cx + 0.5) * sub, (cy + 0.5) * sub], axis=-1)  # (B, S, 2)

    # targets are warped unconditionally: self-supervised rounds pass zero
    # maps (which warp to zeros), so the seed round (depth supervision) and
    # every mapping round share ONE compiled fill program instead of two —
    # distinct programs pay a large first-call cost on the shared-host relay
    warped = jax.vmap(lambda m, t, s: warp_target_map(m, t, s))(
        target_maps, aug["thetas"], aug["scales"]
    )  # (B, hs, ws, 3)
    t_flat = warped.reshape(B, hs * ws, 3)
    rows_crds = jnp.take_along_axis(t_flat, cell_idx[..., None], axis=1)

    return {
        "features": rows_feat.astype(jnp.bfloat16).reshape(B * S, -1),
        "target_px": px.reshape(B * S, 2),
        "target_crds": rows_crds.reshape(B * S, 3),
        "theta": jnp.repeat(aug["thetas"], S),
        "scale": jnp.repeat(aug["scales"], S),
    }


@partial(jax.jit, donate_argnames=("buffer",))
def _write_rows(buffer, rows, start):
    """In-place (donated) row write at dynamic offset."""
    return jax.tree.map(
        lambda buf, r: jax.lax.dynamic_update_slice_in_dim(buf, r.astype(buf.dtype), start, 0),
        buffer,
        rows,
    )


@partial(jax.jit, donate_argnames=("buffer",), static_argnames=("cfg",))
def _fill_pass(
    buffer,
    encoder_params,
    images_dev,
    sizes_dev,
    targets_dev,
    order,  # (n_chunks * chunk,) LOCAL image indices (rows of targets/ctx)
    order_global,  # same shape: indices into the device canvas/size arrays
    key,
    row0,  # starting buffer row for this pass
    cfg: BufferConfig,
):
    """One full dataset pass as a single device program.

    The per-chunk Python loop costs one host round-trip per chunk (~0.3 s
    each through the axon relay — 25x the actual encoder time); scanning the
    chunks inside one jitted call makes a pass one dispatch.
    """
    chunk = cfg.image_chunk
    S = cfg.samples_per_image
    n_chunks = order.shape[0] // chunk
    keys = jax.random.split(key, n_chunks)

    def body(buf, inputs):
        ci, k = inputs
        idx = jax.lax.dynamic_slice_in_dim(order, ci * chunk, chunk, 0)
        idx_g = jax.lax.dynamic_slice_in_dim(order_global, ci * chunk, chunk, 0)
        rows = _fill_chunk.__wrapped__(
            encoder_params,
            images_dev[idx_g],
            sizes_dev[idx_g],
            targets_dev[idx],
            k,
            cfg,
        )
        rows["img_idx"] = jnp.repeat(idx.astype(jnp.int32), S)
        buf = jax.tree.map(
            lambda b, r: jax.lax.dynamic_update_slice_in_dim(
                b, r.astype(b.dtype), row0 + ci * chunk * S, 0
            ),
            buf,
            rows,
        )
        return buf, None

    buffer, _ = jax.lax.scan(
        body, buffer, (jnp.arange(n_chunks, dtype=jnp.int32), keys)
    )
    return buffer


def buffer_alloc_rows(
    cfg: BufferConfig,
    num_images: int,
    devices_pad: int = 1,
    pad_rows_to_bucket: bool = True,
) -> tuple[int, int]:
    """(total_rows, allocated_rows) for a fill — the single source of the
    buffer shape, shared by fill_training_buffer and the program prewarmer
    (reconstruct/warmup.py), which must construct bit-identical shapes."""
    total, _ = plan_buffer_size(cfg, num_images)
    total = (total // cfg.samples_per_image) * cfg.samples_per_image
    if devices_pad > 1:
        total = (total // devices_pad) * devices_pad
    alloc = next_bucket(total, 4096) if pad_rows_to_bucket else total
    return total, alloc


def allocate_buffer(alloc: int, feat_dim: int, host: bool = False) -> dict:
    """Zero-initialized structure-of-arrays patch buffer (device or host)."""
    if host:
        return {
            "features": np.zeros((alloc, feat_dim), np.float16),
            "target_px": np.zeros((alloc, 2), np.float32),
            "target_crds": np.zeros((alloc, 3), np.float32),
            "img_idx": np.zeros((alloc,), np.int32),
            "theta": np.zeros((alloc,), np.float32),
            "scale": np.ones((alloc,), np.float32),
        }
    return {
        "features": jnp.zeros((alloc, feat_dim), jnp.bfloat16),
        "target_px": jnp.zeros((alloc, 2), jnp.float32),
        "target_crds": jnp.zeros((alloc, 3), jnp.float32),
        "img_idx": jnp.zeros((alloc,), jnp.int32),
        "theta": jnp.zeros((alloc,), jnp.float32),
        "scale": jnp.ones((alloc,), jnp.float32),
    }


def next_bucket(n: int, minimum: int = 1) -> int:
    """Round up to the next power of two (jit-shape bucketing)."""
    b = max(minimum, 1)
    while b < n:
        b *= 2
    return b


def fill_training_buffer(
    key: jax.Array,
    encoder_params,
    images_u8: np.ndarray,
    sizes: np.ndarray,
    cfg: BufferConfig,
    target_maps: np.ndarray | None = None,
    devices_pad: int = 1,
    host_spill: bool = False,
    pad_rows_to_bucket: bool = False,
    device_view=None,
    target_rows_bucket: int = 0,
):
    """Fill the patch buffer from a scene's canvas images.

    Args:
      images_u8: (N, H, W) uint8 canvases (host or device).
      sizes: (N, 2) content sizes.
      target_maps: optional (N, hs, ws, 3) world-coordinate targets (seed
        depth supervision); None for the self-supervised rounds.
      devices_pad: round the buffer row count down to a multiple of this
        (sharding alignment).
      device_view: optional (full_canvases_dev, full_sizes_dev, indices)
        from DecodedImages.device_view() — reuses the scene's one-time
        canvas upload instead of re-sending the (subset) images every round.
      target_rows_bucket: pad the per-image target-map table to this many
        rows (shape bucketing: rounds mapping different-size subsets share
        one compiled fill program; pass the full scene's bucket).

    Returns:
      dict of device arrays: features (M, C) bf16, target_px (M, 2),
      target_crds (M, 3), img_idx (M,) int32, theta (M,), scale (M,).
    """
    n, H, W = images_u8.shape
    _, passes = plan_buffer_size(cfg, n)
    # jit-shape bucketing: allocate the padded size up front (one buffer, no
    # transient duplicate); the pad region is cyclic-filled after the fill
    total, alloc = buffer_alloc_rows(
        cfg, n, devices_pad, pad_rows_to_bucket and not host_spill
    )

    use_depth = target_maps is not None
    feat_dim = encoder_params["res2_conv3"]["w"].shape[-1]
    S = cfg.samples_per_image

    # host buffer = the `--training_buffer_cpu` equivalent (reference
    # ace_trainer.py:52,330-340): rows spill to host RAM; training streams
    # batches back.
    buffer = allocate_buffer(alloc, feat_dim, host=host_spill)

    if device_view is not None:
        images_dev, sizes_dev, root_idx = device_view
        idx_map = np.asarray(root_idx)
    else:
        images_dev = jnp.asarray(images_u8)
        sizes_dev = jnp.asarray(sizes)
        idx_map = np.arange(n)
    hs, ws = H // cfg.subsample, W // cfg.subsample
    n_targets = max(n, target_rows_bucket)
    if use_depth:
        tm = np.asarray(target_maps, np.float32)
        if n_targets > n:
            tm = np.concatenate(
                [tm, np.zeros((n_targets - n, hs, ws, 3), np.float32)], axis=0
            )
        targets_dev = jnp.asarray(tm)
    else:
        targets_dev = jnp.zeros((n_targets, hs, ws, 3), jnp.float32)

    chunk = cfg.image_chunk
    row = 0
    done = False
    staging_cache: dict[int, dict] = {}
    for p in range(passes):
        if done:
            break
        order = np.random.default_rng(p).permutation(n)

        # fast path: the pass's full chunks run as a handful of fused device
        # programs. Each program scans a segment of chunks into a bounded
        # staging block (scan carries double-buffer, so the carry must stay
        # ~1 GB, not the full 8.6 GB buffer), then one donated write moves
        # the block into the big buffer — ~2 dispatches per GB instead of
        # one per 32-image chunk (the per-chunk loop is pure host-latency:
        # 500+ round trips, ~500 s, at the 7-Scenes-chess scale). Segments
        # run as long as FULL chunks still fit in the remaining buffer rows —
        # including for a pass that only partially fits (the chess-scale
        # second pass); only the sub-chunk remainder takes the per-chunk
        # path below.
        if not host_spill:
            seg_chunks = max(1, 1_048_576 // (chunk * S))
            # segments come in exactly TWO shapes (full and 1/4) — a
            # data-dependent tail length would compile a fresh _fill_pass
            # program per distinct scene/round size, and every distinct
            # program pays a large first-call cost on the shared-host relay.
            # Whatever neither shape covers falls to the per-chunk path.
            small_seg = max(1, seg_chunks // 4)
            pos = 0
            while True:
                fit_chunks = (total - row) // (chunk * S)
                avail_chunks = (n - pos) // chunk
                cap = min(fit_chunks, avail_chunks)
                if cap >= seg_chunks:
                    take = seg_chunks
                elif cap >= small_seg:
                    take = small_seg
                else:
                    break
                seg = order[pos : pos + take * chunk]
                key, pass_key = jax.random.split(key)
                staging = staging_cache.pop(take * chunk * S, None)
                if staging is None:
                    staging = {
                        k: jnp.zeros((take * chunk * S,) + v.shape[1:], v.dtype)
                        for k, v in buffer.items()
                    }
                staging = _fill_pass(
                    staging,
                    encoder_params,
                    images_dev,
                    sizes_dev,
                    targets_dev,
                    jnp.asarray(seg, jnp.int32),
                    jnp.asarray(idx_map[seg], jnp.int32),
                    pass_key,
                    0,
                    cfg,
                )
                buffer = _write_rows(buffer, staging, row)
                # _fill_pass donates its staging arg; the returned block can
                # be reused next segment (every row gets overwritten)
                staging_cache[take * chunk * S] = staging
                row += take * chunk * S
                pos += take * chunk
            if row >= total:
                break
            order = order[pos:]  # remainder (< chunk imgs or < chunk rows)
            if order.size == 0:
                continue

        for c0 in range(0, len(order), chunk):
            idx = order[c0 : c0 + chunk]
            n_real = len(idx)
            if n_real < chunk:  # pad the tail chunk; padding rows discarded below
                idx = np.concatenate([idx, np.full(chunk - n_real, idx[-1])])
            key, sub_key = jax.random.split(key)
            rows = _fill_chunk(
                encoder_params,
                images_dev[idx_map[idx]],
                sizes_dev[idx_map[idx]],
                targets_dev[idx],
                sub_key,
                cfg,
            )
            rows["img_idx"] = jnp.repeat(jnp.asarray(idx, jnp.int32), S)
            if n_real < chunk:
                # drop the pad image's duplicate rows so each pass visits
                # every image exactly once (reference epoch semantics)
                rows = jax.tree.map(lambda r: r[: n_real * S], rows)
            n_rows = min(n_real * S, total - row)
            if n_rows < n_real * S:
                rows = jax.tree.map(lambda r: r[:n_rows], rows)
                done = True
            if host_spill:
                host_rows = jax.device_get(rows)
                for k, v in host_rows.items():
                    buffer[k][row : row + n_rows] = np.asarray(v)[:n_rows]
            else:
                buffer = _write_rows(buffer, rows, row)
            row += n_rows
            if row >= total:
                done = True
                break

    # cyclic-fill the bucket pad region from the real rows (bounded chunks,
    # donated writes — no second full-size buffer)
    pos = row
    while pos < alloc:
        # power-of-two copy blocks: each distinct block size is its own
        # compiled slice/write program, and a data-dependent size would mint
        # fresh programs every round (each costs a relay cache-read/compile)
        cap = min(row, alloc - pos, 1 << 20)
        ncopy = 1 << (cap.bit_length() - 1)
        if pos + ncopy > alloc:
            ncopy = alloc - pos  # alloc is a bucket; remainder is pow2 too
        src = jax.tree.map(lambda a: jax.lax.dynamic_slice_in_dim(a, 0, ncopy, 0), buffer)
        buffer = _write_rows(buffer, src, pos)
        pos += ncopy

    return buffer
