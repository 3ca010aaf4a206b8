"""Native decode pool tests (skipped if g++/libjpeg unavailable)."""

import numpy as np
import pytest

from plip_tpu import native

pytestmark = pytest.mark.skipif(not native.available(), reason="no native toolchain")

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("jp")
    paths, arrays = [], []
    for i, shape in enumerate([(224, 224), (300, 400), (512, 512)]):
        arr = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        p = str(d / f"im_{i}.jpg")
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)
        arrays.append(np.asarray(Image.open(p)))  # decoded-by-PIL ground truth
    return paths, arrays


def test_decode_matches_pil(jpegs):
    paths, arrays = jpegs
    for p, ref in zip(paths, arrays):
        out = native.decode_jpeg(p)
        assert out is not None
        assert out.shape == ref.shape
        # identical libjpeg under both, same IDCT: expect exact or ±1
        assert np.max(np.abs(out.astype(int) - ref.astype(int))) <= 1


def test_decode_dct_scaling(jpegs):
    paths, _ = jpegs
    out = native.decode_jpeg(paths[2], scale_shorter=128)  # 512 -> 256 (4/8)
    assert out is not None
    assert min(out.shape[:2]) in (128, 256)  # whichever M/8 step >= 128
    assert min(out.shape[:2]) >= 128


def test_decode_batch_fixed(jpegs):
    paths, _ = jpegs
    batch, status = native.decode_batch_fixed(paths * 4, shorter=224, crop=224)
    assert batch.shape == (12, 224, 224, 3)
    # status contract (v2): 0 = bit-exact (source already 224x224),
    # 1 = decoded but RESAMPLED, <0 = failure
    assert (status >= 0).all()
    expected = np.array([0, 1, 1] * 4, np.int32)  # fixture shapes 224/300x400/512
    np.testing.assert_array_equal(status, expected)
    assert batch.std() > 10  # actual image content


def test_decode_batch_failure_slot(jpegs, tmp_path):
    paths, _ = jpegs
    bad = str(tmp_path / "nope.jpg")
    batch, status = native.decode_batch_fixed([paths[0], bad], crop=64)
    assert status[0] == 1 and status[1] < 0  # resampled ok / failed
    assert (batch[1] == 0).all()


def test_decode_corrupt_file(tmp_path):
    p = str(tmp_path / "garbage.jpg")
    with open(p, "wb") as f:
        f.write(b"not a jpeg at all" * 10)
    assert native.decode_jpeg(p) is None
