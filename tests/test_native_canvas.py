"""Native canvas pipeline vs the PIL reference path."""

import numpy as np
import pytest
from PIL import Image

from acezero_tpu.data.images import decode_to_canvas
from acezero_tpu.data.native import get_lib, gray_resize_center_batch


@pytest.fixture(scope="module")
def image_files(tmp_path_factory):
    rng = np.random.default_rng(0)
    out = tmp_path_factory.mktemp("imgs")
    paths = []
    for i, (h, w) in enumerate([(480, 640), (640, 480), (600, 800)]):
        # smooth image so resampling-filter differences stay small
        yy, xx = np.meshgrid(np.linspace(0, 4, h), np.linspace(0, 4, w), indexing="ij")
        img = (127 + 90 * np.sin(yy * 2) * np.cos(xx * 3) + rng.normal(size=(h, w)) * 4).clip(0, 255)
        rgb = np.stack([img, img * 0.9, img * 0.8], axis=-1).astype(np.uint8)
        p = out / f"img_{i}.png"
        Image.fromarray(rgb).save(p)
        paths.append(str(p))
    return paths


def test_native_lib_builds():
    lib = get_lib()
    if lib is None:
        pytest.skip("no C++ toolchain in environment")
    assert lib.acz_version() == 1


def test_native_matches_pil_path(image_files):
    if get_lib() is None:
        pytest.skip("no C++ toolchain in environment")
    native = decode_to_canvas(image_files, short_size=240, use_native=True)
    pil = decode_to_canvas(image_files, short_size=240, use_native=False)

    assert native.canvases.shape == pil.canvases.shape
    np.testing.assert_array_equal(native.sizes, pil.sizes)
    np.testing.assert_allclose(native.scale_factors, pil.scale_factors, rtol=1e-5)

    # resampling filters differ slightly (area vs PIL bilinear); images must
    # agree closely on smooth content
    diff = native.canvases.astype(np.int32) - pil.canvases.astype(np.int32)
    assert np.abs(diff).mean() < 3.0, f"mean abs diff {np.abs(diff).mean()}"
    assert (np.abs(diff) > 30).mean() < 0.01


def test_native_batch_direct():
    if get_lib() is None:
        pytest.skip("no C++ toolchain in environment")
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 255, (64, 96, 3), dtype=np.uint8),
            rng.integers(0, 255, (100, 50), dtype=np.uint8)]
    out_sizes = np.array([[32, 48], [100, 50]], np.int32)
    canvases = gray_resize_center_batch(imgs, out_sizes, (104, 56))
    assert canvases is not None
    assert canvases.shape == (2, 104, 56)
    # second image is not resized: luma should match exactly for grayscale in
    y0, x0 = (104 - 100) // 2, (56 - 50) // 2
    np.testing.assert_array_equal(canvases[1, y0 : y0 + 100, x0 : x0 + 50], imgs[1])
