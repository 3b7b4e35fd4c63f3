"""Host-side image decode into static grayscale canvases.

Images are decoded once, grayscaled (ITU-R 601 luma, like torchvision
Grayscale), resized so the short side matches `image_short_size`
(/root/reference/dataset.py:188-194), and centered on a static uint8 canvas
shared by the whole dataset. Everything downstream (normalization, photo
jitter, scale/rotation augmentation) runs on device with static shapes; the
canvas mask marks real content vs padding.
"""

from __future__ import annotations

import concurrent.futures as _futures
import math
from dataclasses import dataclass, field

import numpy as np
from PIL import Image

# Grayscale normalization statistics (reference dataset.py:150-153,
# calculated over the 7-Scenes training set, generalize well).
GRAY_MEAN = 0.4
GRAY_STD = 0.25


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class _DeviceCanvasRoot:
    """Lazy, once-per-scene upload of the full canvas set to device HBM.

    The canvases are the single biggest host->device payload (~1.2 GB at
    7-Scenes-chess scale over the axon relay, ~20 s); every mapping round
    and every registration round consumes (a subset of) them, so re-sending
    per stage dominated the reconstruction wall-clock. Subsets share the
    root and index into it on device instead.
    """

    def __init__(self, canvases: np.ndarray, sizes: np.ndarray):
        self._canvases_np = canvases
        self._sizes_np = sizes
        self._dev = None

    def arrays(self):
        if self._dev is None:
            import jax.numpy as jnp

            self._dev = (
                jnp.asarray(self._canvases_np),
                jnp.asarray(self._sizes_np, jnp.int32),
            )
        return self._dev


@dataclass
class DecodedImages:
    """Static-canvas dataset images.

    canvases: (N, Hc, Wc) uint8 grayscale, content centered.
    sizes: (N, 2) int32 — (h, w) of the real content after resize.
    orig_sizes: (N, 2) int32 — (h, w) before resize (for the focal heuristic).
    scale_factors: (N,) float32 — short_size / original_short_side, the factor
      already applied to content (multiply original-pixel focals by this).
    """

    canvases: np.ndarray
    sizes: np.ndarray
    orig_sizes: np.ndarray
    scale_factors: np.ndarray
    device_root: "_DeviceCanvasRoot | None" = field(
        default=None, repr=False, compare=False
    )
    root_indices: np.ndarray | None = field(default=None, repr=False, compare=False)
    # True when `canvases` is a zero-stride placeholder (SceneData.subset
    # with copy_canvases=False): pixel content must come from device_view()
    content_is_stub: bool = field(default=False, repr=False, compare=False)

    @property
    def canvas_hw(self) -> tuple[int, int]:
        return self.canvases.shape[1], self.canvases.shape[2]

    def ensure_root(self) -> "_DeviceCanvasRoot":
        if self.device_root is None:
            self.device_root = _DeviceCanvasRoot(self.canvases, self.sizes)
            self.root_indices = np.arange(len(self.canvases))
        return self.device_root

    def device_view(self):
        """(full_canvases_dev, full_sizes_dev, indices): this image set as
        indices into the device-resident root canvas array."""
        root = self.ensure_root()
        canv, sz = root.arrays()
        return canv, sz, np.asarray(self.root_indices)


def _decode_one(path: str, short_size: int):
    with Image.open(path) as img:
        img = img.convert("L")
        w0, h0 = img.size
        scale = short_size / min(w0, h0)
        w1, h1 = round(w0 * scale), round(h0 * scale)
        img = img.resize((w1, h1), Image.BILINEAR)
        return np.asarray(img, np.uint8), (h0, w0), scale


def _decode_cache_key(paths: list[str], short_size: int, canvas_hw) -> str:
    """Content key for the decoded-canvas cache: file identities (path,
    size, mtime_ns) + the decode parameters. No image decoding needed."""
    import hashlib
    import os

    h = hashlib.sha1()
    h.update(f"{short_size}|{canvas_hw}|v1".encode())
    for p in paths:
        st = os.stat(p)
        h.update(f"{p}|{st.st_size}|{st.st_mtime_ns}\n".encode())
    return h.hexdigest()


def _decode_cache_load(cache_dir, key: str) -> "DecodedImages | None":
    from pathlib import Path

    d = Path(cache_dir) / key
    if not (d / "ok").exists():
        return None
    try:
        return DecodedImages(
            canvases=np.load(d / "canvases.npy", mmap_mode="r"),
            sizes=np.load(d / "sizes.npy"),
            orig_sizes=np.load(d / "orig_sizes.npy"),
            scale_factors=np.load(d / "scale_factors.npy"),
        )
    except Exception:  # noqa: BLE001 — any corruption falls back to decoding
        return None


def _decode_cache_store(cache_dir, key: str, imgs: "DecodedImages") -> None:
    import os
    import tempfile
    from pathlib import Path

    d = Path(cache_dir)
    d.mkdir(parents=True, exist_ok=True)
    tmp = Path(tempfile.mkdtemp(dir=d, prefix=f".{key[:12]}_"))
    try:
        np.save(tmp / "canvases.npy", imgs.canvases)
        np.save(tmp / "sizes.npy", imgs.sizes)
        np.save(tmp / "orig_sizes.npy", imgs.orig_sizes)
        np.save(tmp / "scale_factors.npy", imgs.scale_factors)
        (tmp / "ok").touch()
        os.replace(tmp, d / key)  # atomic publish
    except OSError:
        import shutil as _shutil

        _shutil.rmtree(tmp, ignore_errors=True)


def decode_to_canvas(
    paths: list[str],
    short_size: int = 480,
    canvas_hw: tuple[int, int] | None = None,
    num_workers: int = 16,
    use_native: bool = True,
    cache_dir: str | None = None,
) -> DecodedImages:
    """Decode all images and center them on a shared canvas.

    The canvas defaults to the max resized extent over the dataset, rounded
    up to a multiple of 8 (the encoder stride) so the subsampled feature grid
    tiles it exactly.

    The grayscale/resize/placement pass runs through the native OpenMP
    pipeline (native/canvas.cpp) when a compiler is available, with a PIL
    fallback; decoding itself stays PIL (threaded — PIL releases the GIL).

    cache_dir: optional decoded-canvas cache. At 7-Scenes-chess scale the
    PNG decode costs ~30 s on one host core per reconstruction; the canvases
    are pure functions of (files, short_size, canvas), so repeat runs mmap
    them back in well under a second. Keyed by per-file size+mtime_ns.
    """
    n = len(paths)

    cache_key = None
    if cache_dir is not None:
        try:
            cache_key = _decode_cache_key(paths, short_size, canvas_hw)
            cached = _decode_cache_load(cache_dir, cache_key)
            if cached is not None and len(cached.canvases) == n:
                return cached
        except OSError:
            cache_key = None

    def _load_raw(p):
        with Image.open(p) as img:
            # normalize exotic modes (palette, LA, 16-bit, CMYK) to what the
            # native luma kernel understands: uint8 L or RGB
            if img.mode not in ("L", "RGB"):
                img = img.convert("RGB" if img.mode not in ("1", "I", "I;16", "F") else "L")
            arr = np.asarray(img)
            if arr.dtype != np.uint8:
                arr = np.clip(arr, 0, 255).astype(np.uint8)
            return arr

    native = None
    if use_native:
        from acezero_tpu.data.native import get_lib

        native = get_lib()

    if native is not None:
        with _futures.ThreadPoolExecutor(max_workers=num_workers) as ex:
            raws = list(ex.map(_load_raw, paths))
        orig_sizes = np.array([r.shape[:2] for r in raws], np.int32)
        scales = short_size / orig_sizes.min(axis=1).astype(np.float32)
        sizes = np.round(orig_sizes * scales[:, None]).astype(np.int32)

        if canvas_hw is None:
            hc = _round_up(int(sizes[:, 0].max()), 8)
            wc = _round_up(int(sizes[:, 1].max()), 8)
        else:
            hc, wc = canvas_hw

        if (sizes[:, 0] <= hc).all() and (sizes[:, 1] <= wc).all():
            from acezero_tpu.data.native import gray_resize_center_batch

            canvases = gray_resize_center_batch(raws, sizes, (hc, wc))
            if canvases is not None:
                out = DecodedImages(
                    canvases=canvases, sizes=sizes, orig_sizes=orig_sizes,
                    scale_factors=scales,
                )
                if cache_key is not None:
                    _decode_cache_store(cache_dir, cache_key, out)
                return out
        # fall through to the PIL path (oversized content or native failure)

    with _futures.ThreadPoolExecutor(max_workers=num_workers) as ex:
        decoded = list(ex.map(lambda p: _decode_one(p, short_size), paths))

    sizes = np.array([d[0].shape for d in decoded], np.int32)
    orig_sizes = np.array([d[1] for d in decoded], np.int32)
    scales = np.array([d[2] for d in decoded], np.float32)

    if canvas_hw is None:
        hc = _round_up(int(sizes[:, 0].max()), 8)
        wc = _round_up(int(sizes[:, 1].max()), 8)
    else:
        hc, wc = canvas_hw

    canvases = np.zeros((n, hc, wc), np.uint8)
    for i, (img, _, _) in enumerate(decoded):
        h, w = img.shape
        if h > hc or w > wc:  # center-crop anything larger than the canvas
            top = max(0, (h - hc) // 2)
            left = max(0, (w - wc) // 2)
            img = img[top : top + min(h, hc), left : left + min(w, wc)]
            h, w = img.shape
            sizes[i] = (h, w)
        y0 = (hc - h) // 2
        x0 = (wc - w) // 2
        canvases[i, y0 : y0 + h, x0 : x0 + w] = img

    out = DecodedImages(
        canvases=canvases, sizes=sizes, orig_sizes=orig_sizes, scale_factors=scales
    )
    if cache_key is not None:
        _decode_cache_store(cache_dir, cache_key, out)
    return out


def heuristic_focal_length(orig_h: int, orig_w: int) -> float:
    """70% of the image diagonal, in original pixels (reference
    dataset.py:269-274)."""
    return math.sqrt(orig_h**2 + orig_w**2) * 0.7
