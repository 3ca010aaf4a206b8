"""Embedder-layer tests: cache-first behavior, L2 contract, factory dispatch."""

import os
from types import SimpleNamespace

import numpy as np
import pytest

import jax

from plip_tpu.embedders import CLIPEmbedder, EmbedderFactory
from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig, TextConfig, VisionConfig
from plip_tpu.utils.checkpoint import save_checkpoint


@pytest.fixture(scope="module")
def small_ckpt(tmp_path_factory):
    cfg = CLIPConfig(
        vision=VisionConfig(width=64, layers=2, heads=4, image_size=224, patch_size=32),
        text=TextConfig(width=32, layers=2, heads=4, vocab_size=49408, context_length=77),
        embed_dim=16,
    )
    params = jclip.init_params(jax.random.PRNGKey(1), cfg)
    path = str(tmp_path_factory.mktemp("ck") / "small.npz")
    save_checkpoint(path, params, cfg)
    return path


@pytest.fixture()
def cache_env(tmp_path, monkeypatch):
    monkeypatch.setenv("PC_CACHE_FOLDER", str(tmp_path / "cache"))
    os.makedirs(tmp_path / "cache", exist_ok=True)
    return tmp_path


@pytest.fixture(scope="module")
def image_paths(tmp_path_factory):
    from PIL import Image

    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("tiles")
    paths = []
    for i in range(6):
        arr = rng.integers(0, 256, (224, 224, 3), dtype=np.uint8)
        p = str(d / f"tile_{i}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
    return paths


def test_clip_embedder_images_normalized_and_cached(small_ckpt, cache_env, image_paths):
    from plip_tpu.api import PLIP

    emb = CLIPEmbedder(PLIP(small_ckpt), "plip", "backbone_v1.pt")
    out = emb.image_embedder(image_paths, batch_size=4)
    assert out.shape == (6, 16)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)

    # cache layout: {cache}/{dataset}/{model}/{basename}
    out2 = emb.image_embedder(image_paths, batch_size=4)
    np.testing.assert_array_equal(out, out2)

    # a different additional_cache_name misses
    out3 = emb.image_embedder(image_paths, batch_size=4, additional_cache_name="x_test.csv")
    np.testing.assert_allclose(out, out3, rtol=1e-5)


def test_decode_mode_provenance(small_ckpt, cache_env, image_paths):
    """VERDICT r3 #7: an approx-mode cache entry must not silently satisfy an
    exact-contract request; sidecars record decode_mode provenance."""
    from plip_tpu.api import PLIP
    from plip_tpu.utils.cacher import get_savepath, read_cache_meta

    emb = CLIPEmbedder(PLIP(small_ckpt), "plip", "backbone_v1.pt")
    out = emb.image_embedder(image_paths, batch_size=4,
                             decode_mode="fast_approx")
    save_path = get_savepath("plipimg", "backbone_v1.pt")
    assert read_cache_meta(save_path) == {"decode_mode": "fast_approx"}

    # approx request hits the approx entry
    out2 = emb.image_embedder(image_paths, batch_size=4,
                              decode_mode="fast_approx")
    np.testing.assert_array_equal(out, out2)

    # exact-contract request refuses it: warn + recompute + overwrite sidecar
    with pytest.warns(UserWarning, match="fast_approx"):
        out3 = emb.image_embedder(image_paths, batch_size=4,
                                  decode_mode="fast")
    np.testing.assert_allclose(out, out3, rtol=1e-4)  # PNGs: same pixels
    assert read_cache_meta(save_path) == {"decode_mode": "fast"}

    # now the exact entry satisfies BOTH exact and approx requests silently
    out4 = emb.image_embedder(image_paths, batch_size=4, decode_mode="fast")
    np.testing.assert_array_equal(out3, out4)
    out5 = emb.image_embedder(image_paths, batch_size=4,
                              decode_mode="fast_approx")
    np.testing.assert_array_equal(out3, out5)

    # sidecar-less (reference-written) entries read back as unknown -> hit
    os.remove(save_path + ".meta.json")
    out6 = emb.image_embedder(image_paths, batch_size=4, decode_mode="fast")
    np.testing.assert_array_equal(out3, out6)


def test_clip_embedder_text(small_ckpt, cache_env):
    from plip_tpu.api import PLIP

    emb = CLIPEmbedder(PLIP(small_ckpt), "plip", "backbone_v1.pt")
    out = emb.text_embedder(["benign", "malignant", "stroma"], batch_size=2)
    assert out.shape == (3, 16)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)
    out2 = emb.text_embedder(["benign", "malignant", "stroma"], batch_size=2)
    np.testing.assert_array_equal(out, out2)


def test_factory_dispatch(small_ckpt, cache_env, image_paths, monkeypatch):
    monkeypatch.setenv("PC_CLIP_ARCH", "ViT-B/32")
    f = EmbedderFactory()
    e = f.factory(SimpleNamespace(model_name="plip", backbone=small_ckpt))
    assert isinstance(e, CLIPEmbedder)
    assert e.model.cfg.embed_dim == 16  # loaded from backbone path

    with pytest.raises(ValueError):
        f.factory(SimpleNamespace(model_name="nope", backbone=""))


def test_factory_mudipath_random(cache_env, image_paths):
    from plip_tpu.embedders import DenseNetEmbedder

    f = EmbedderFactory()
    e = f.factory(SimpleNamespace(model_name="mudipath", backbone=""))
    assert isinstance(e, DenseNetEmbedder)
    out = e.image_embedder(image_paths[:2], batch_size=2)
    assert out.shape == (2, 1024)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)
    with pytest.raises(NotImplementedError):
        e.text_embedder(["x"])
