"""Streaming WSI pipeline tests."""

import numpy as np
import pytest

import jax

from plip_tpu.data.wsi import (embed_wsi, embed_wsi_pyramid, iter_wsi_pyramid,
                               iter_wsi_tiles)
from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig, TextConfig, VisionConfig


@pytest.fixture(scope="module")
def model():
    from plip_tpu.api import PLIP
    from plip_tpu.utils.checkpoint import save_checkpoint
    import tempfile, os

    cfg = CLIPConfig(
        vision=VisionConfig(width=32, layers=1, heads=2, image_size=224, patch_size=32),
        text=TextConfig(width=32, layers=1, heads=2, vocab_size=512, context_length=16),
        embed_dim=8,
    )
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    path = os.path.join(tempfile.mkdtemp(), "m.npz")
    save_checkpoint(path, params, cfg)
    return PLIP(path)


def test_iter_tiles_grid():
    arr = np.full((500, 700, 3), 100, np.uint8)
    tiles = list(iter_wsi_tiles(arr, tile=224, overlap=0.0))
    # rows: y in {0, 224}; cols: x in {0, 224, 448}
    assert len(tiles) == 2 * 3
    t0, (y, x) = tiles[0]
    assert t0.shape == (224, 224, 3) and (y, x) == (0, 0)


def test_iter_tiles_overlap_and_downsample():
    arr = np.full((896, 896, 3), 100, np.uint8)
    n_plain = len(list(iter_wsi_tiles(arr, overlap=0.0)))
    n_half = len(list(iter_wsi_tiles(arr, overlap=0.5)))
    assert n_half > n_plain
    n_ds = len(list(iter_wsi_tiles(arr, downsample=2)))
    assert n_ds == 4  # 448x448 -> 2x2 tiles
    assert n_ds < n_plain


def test_background_filter():
    arr = np.full((448, 448, 3), 255, np.uint8)  # all background
    arr[:224, :224] = 80  # one tissue tile
    tiles = list(iter_wsi_tiles(arr, non_bg_threshold=0.5))
    assert len(tiles) == 1
    assert tiles[0][1] == (0, 0)


def _synthetic_wsi(h=1600, w=2000, seed=0):
    """White slide with tissue blobs — enough structure that the background
    filter keeps/drops different tiles per downsample level."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    arr = np.full((h, w, 3), 255, np.uint8)
    for _ in range(12):
        y, x = rng.integers(0, h - 400), rng.integers(0, w - 400)
        bh, bw = rng.integers(200, 400, 2)
        arr[y : y + bh, x : x + bw] = rng.integers(60, 190, (bh, bw, 3))
    return Image.fromarray(arr)


def test_pyramid_matches_offline_sweep_tile_for_tile():
    """VERDICT r1 #7 'done' gate: the one-pass streaming pyramid must equal
    the reference's offline per-downsample harvest
    (datagen.preprocess_digestpath.sliding_crop == preprocess_DigestPath.py
    random_crop) tile-for-tile — same grid (float stride, far-edge drop),
    same bicubic level resize, same background filter, same order."""
    from plip_tpu.datagen.preprocess_digestpath import sliding_crop

    img = _synthetic_wsi()
    downs = (2, 4, 8, 16, 32)
    streamed = list(iter_wsi_pyramid(img, downsample_list=downs))

    offline = []
    for d in downs:
        patches, stats = sliding_crop(
            img, downsample=d, cropsize=224, crop_overlap=0.1,
            non_bg_threshold=0.5,
        )
        if patches is None:
            continue
        offline.append((d, patches))

    i = 0
    for d, patches in offline:
        for j in range(patches.shape[0]):
            patch, (sd, y, x) = streamed[i]
            assert sd == d
            np.testing.assert_array_equal(patch, patches[j])
            i += 1
    assert i == len(streamed)
    assert len(streamed) > 0


def test_pyramid_skips_too_small_levels():
    img = _synthetic_wsi(h=500, w=500)
    # at downsample 4 the level is 125x125 < 224 -> skipped entirely
    streamed = list(iter_wsi_pyramid(img, downsample_list=(1, 4)))
    assert all(c[0] == 1 for _, c in streamed)


def test_embed_wsi_pyramid(model):
    img = _synthetic_wsi(h=900, w=900, seed=3)
    emb, coords = embed_wsi_pyramid(
        model, img, downsample_list=(1, 2), batch_size=4,
        non_bg_threshold=0.3,
    )
    tiles = [t for t, _ in iter_wsi_pyramid(img, (1, 2),
                                            non_bg_threshold=0.3)]
    assert emb.shape == (len(tiles), 8)
    assert coords.shape == (len(tiles), 3)
    assert set(coords[:, 0]) <= {1, 2}
    direct = model.encode_images(tiles, batch_size=4)
    direct = direct / np.linalg.norm(direct, axis=1, keepdims=True)
    np.testing.assert_allclose(emb, direct, rtol=2e-4, atol=2e-4)


def test_embed_wsi(model):
    rng = np.random.default_rng(0)
    arr = rng.integers(40, 180, (500, 700, 3), dtype=np.uint8)
    emb, coords = embed_wsi(model, arr, batch_size=4)
    assert emb.shape == (6, 8)
    assert coords.shape == (6, 2)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-5)
    # matches direct per-tile encoding
    tiles = [t for t, _ in iter_wsi_tiles(arr)]
    direct = model.encode_images(tiles, batch_size=4)
    direct = direct / np.linalg.norm(direct, axis=1, keepdims=True)
    np.testing.assert_allclose(emb, direct, rtol=2e-4, atol=2e-4)


def test_embed_wsi_all_background(model):
    arr = np.full((448, 448, 3), 255, np.uint8)
    emb, coords = embed_wsi(model, arr, non_bg_threshold=0.5)
    assert emb.shape == (0, 8)
    assert coords.shape == (0, 2)


def test_embed_wsi_mesh(model):
    from plip_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(dp=8, tp=1)
    rng = np.random.default_rng(1)
    arr = rng.integers(40, 180, (500, 500, 3), dtype=np.uint8)
    emb, _ = embed_wsi(model, arr, batch_size=8, mesh=mesh)
    plain, _ = embed_wsi(model, arr, batch_size=8)
    np.testing.assert_allclose(emb, plain, rtol=2e-4, atol=2e-4)
