"""Preprocessing parity vs the torchvision/PIL pipeline the reference uses.

The device path is float end-to-end while PIL rounds to uint8 after each
resample pass, so exact equality is impossible by design; the bound we assert
(~2/255 per pixel pre-normalization) is far inside what the 0.999-cosine
embedding fidelity target tolerates.
"""

import numpy as np
import pytest

from plip_tpu.ops.preprocess import preprocess_batch, preprocess_images
from plip_tpu.ops.resize import (
    crop_offsets,
    resize_crop_matrices,
    resize_matrix,
    torchvision_resized_dims,
)

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _reference_pipeline(arr_u8: np.ndarray, n_px: int = 224) -> np.ndarray:
    """transform.py:45-52 equivalent in pure PIL (torchvision's Resize /
    CenterCrop are thin wrappers over PIL resize + crop; torchvision itself is
    not installed in this environment), returning HWC float."""
    img = Image.fromarray(arr_u8)
    h, w = arr_u8.shape[:2]
    rh, rw = torchvision_resized_dims(h, w, n_px)
    img = img.resize((rw, rh), Image.BICUBIC)
    top, left = crop_offsets(rh, rw, n_px)
    img = img.crop((left, top, left + n_px, top + n_px))
    x = np.asarray(img, np.float32) / 255.0
    return (x - MEAN) / STD


@pytest.mark.parametrize("shape", [(224, 224), (256, 256), (512, 512), (300, 400), (640, 480), (224, 300)])
def test_matches_torchvision(shape):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    ref = _reference_pipeline(arr)
    ours = np.asarray(preprocess_batch(arr[None]))[0]
    assert ours.shape == ref.shape == (224, 224, 3)
    # per-pixel bound: PIL's per-pass uint8 rounding is the only source of
    # difference -> |Δ| ≲ 2 levels / (255 * std)
    diff = np.abs(ours - ref)
    assert diff.max() < 2.5 / (255 * 0.26), diff.max()
    assert diff.mean() < 0.3 / (255 * 0.26)


def test_resized_dims_rule():
    # torchvision Resize(int) contract: shortest side -> size, other side
    # scaled by int(size * long / short); already-short side unchanged.
    assert torchvision_resized_dims(224, 224, 224) == (224, 224)
    assert torchvision_resized_dims(300, 400, 224) == (224, int(224 * 400 / 300))
    assert torchvision_resized_dims(400, 300, 224) == (int(224 * 400 / 300), 224)
    assert torchvision_resized_dims(100, 900, 64) == (64, int(64 * 900 / 100))
    assert torchvision_resized_dims(224, 448, 224) == (224, 448)


def test_identity_resize_is_identity():
    m = resize_matrix(224, 224)
    np.testing.assert_allclose(m, np.eye(224), atol=1e-6)


def test_rows_sum_to_one():
    for in_s, out_s in [(512, 224), (100, 224), (224, 224), (301, 224)]:
        m = resize_matrix(in_s, out_s)
        np.testing.assert_allclose(m.sum(axis=1), np.ones(out_s), atol=1e-5)


def test_mixed_sizes_grouping():
    rng = np.random.default_rng(1)
    imgs = [
        rng.integers(0, 256, (256, 256, 3), dtype=np.uint8),
        rng.integers(0, 256, (300, 400, 3), dtype=np.uint8),
        rng.integers(0, 256, (256, 256, 3), dtype=np.uint8),
    ]
    out = np.asarray(preprocess_images(imgs))
    assert out.shape == (3, 224, 224, 3)
    # order preserved: each row equals its individually processed image
    for i, im in enumerate(imgs):
        one = np.asarray(preprocess_batch(im[None]))[0]
        np.testing.assert_allclose(out[i], one, atol=1e-5)


def test_pil_input_and_grayscale():
    rng = np.random.default_rng(2)
    rgb = Image.fromarray(rng.integers(0, 256, (240, 240, 3), dtype=np.uint8))
    gray = rng.integers(0, 256, (240, 240), dtype=np.uint8)
    out = np.asarray(preprocess_images([rgb, gray]))
    assert out.shape == (2, 224, 224, 3)


def test_too_small_raises():
    # Shortest-side resize makes both dims >= shortest, so under-fill only
    # happens when crop > shortest (a misconfiguration worth failing loudly).
    with pytest.raises(ValueError):
        resize_crop_matrices(100, 100, 64, 128)


def test_matches_hf_processor():
    """Parity with the HF CLIPImageProcessor path (plip.py:35)."""
    transformers = pytest.importorskip("transformers")
    proc = transformers.CLIPImageProcessor(
        do_resize=True,
        size={"shortest_edge": 224},
        resample=3,  # BICUBIC
        do_center_crop=True,
        crop_size={"height": 224, "width": 224},
        do_rescale=True,
        do_normalize=True,
        image_mean=[0.48145466, 0.4578275, 0.40821073],
        image_std=[0.26862954, 0.26130258, 0.27577711],
    )
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, (300, 260, 3), dtype=np.uint8)
    ref = proc(Image.fromarray(arr), return_tensors="np")["pixel_values"][0].transpose(1, 2, 0)
    ours = np.asarray(preprocess_batch(arr[None]))[0]
    diff = np.abs(ours - ref)
    # HF center-crop uses floor instead of round -> tolerate a 1px shift by
    # comparing the interior.
    assert diff[2:-2, 2:-2].max() < 4.0 / (255 * 0.26)
