"""Full-size ViT-B/32 parity vs HF CLIPModel — the exact geometry of the
`vinid/plip` checkpoint (BASELINE fidelity target: cosine ≥ 0.999; we assert
≥ 0.9999 in fp32). Random weights, built locally (no network)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from plip_tpu.models import clip as jclip  # noqa: E402
from plip_tpu.utils.checkpoint import from_hf_clip  # noqa: E402


@pytest.fixture(scope="module")
def full_model():
    # transformers' default CLIPConfig IS ViT-B/32 CLIP (vision 768/12/12
    # patch32, text 512/12/8 vocab 49408 ctx 77, proj 512)
    cfg = transformers.CLIPConfig()
    assert cfg.vision_config.patch_size == 32
    assert cfg.text_config.vocab_size == 49408
    torch.manual_seed(0)
    model = transformers.CLIPModel(cfg).eval()
    return model


def _cos(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))


def test_vit_b32_full_parity(full_model):
    params, cfg = from_hf_clip(full_model.state_dict())
    assert cfg.vision.width == 768 and cfg.vision.heads == 12
    assert cfg.text.width == 512 and cfg.text.heads == 8
    assert cfg.text.eot == 49407

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
    ids = np.zeros((2, 77), np.int64)
    ids[:, 0] = 49406
    ids[0, 1:6] = [320, 1125, 539, 320, 2533]
    ids[0, 6] = 49407
    ids[1, 1:3] = [1000, 2000]
    ids[1, 3] = 49407

    with torch.no_grad():
        ref_img = full_model.get_image_features(
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2))
        ).numpy()
        ref_txt = full_model.get_text_features(
            input_ids=torch.from_numpy(ids)
        ).numpy()

    our_img = np.asarray(jclip.encode_image(params, jnp.asarray(pixels), cfg))
    our_txt = np.asarray(jclip.encode_text(params, jnp.asarray(ids), cfg))

    assert _cos(our_img, ref_img).min() > 0.9999
    assert _cos(our_txt, ref_txt).min() > 0.9999
    np.testing.assert_allclose(our_img, ref_img, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(our_txt, ref_txt, rtol=5e-3, atol=5e-3)
