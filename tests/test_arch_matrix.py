"""Architecture-matrix sanity: every registered CLIP arch and CNN arch
initializes and runs forward with consistent shapes (tiny spatial inputs
where possible to keep CPU time low)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plip_tpu.models import clip as jclip
from plip_tpu.models import densenet as jdense
from plip_tpu.models import resnet as jres
from plip_tpu.models.config import ARCHITECTURES, CLIPConfig


@pytest.mark.parametrize("name", list(ARCHITECTURES))
def test_clip_arch_configs(name):
    cfg = ARCHITECTURES[name]()
    v, t = cfg.vision, cfg.text
    assert v.width % v.heads == 0
    assert t.width % t.heads == 0
    assert v.image_size % v.patch_size == 0
    assert t.eot == t.vocab_size - 1
    # head_dim 64 across the CLIP family
    assert v.head_dim == 64 and t.head_dim == 64


def test_vit_b16_shapes():
    # small spatial input to keep it cheap; tower code is size-agnostic
    import dataclasses

    cfg = ARCHITECTURES["ViT-B/16"]()
    cfg = dataclasses.replace(
        cfg,
        vision=dataclasses.replace(cfg.vision, image_size=32, layers=1),
        text=dataclasses.replace(cfg.text, layers=1, vocab_size=256,
                                 context_length=8, eot_token=255),
    )
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    px = jnp.zeros((1, 32, 32, 3))
    ids = jnp.zeros((1, 8), jnp.int32).at[:, 1].set(255)
    assert jclip.encode_image(params, px, cfg).shape == (1, cfg.embed_dim)
    assert jclip.encode_text(params, ids, cfg).shape == (1, cfg.embed_dim)


@pytest.mark.parametrize("arch", ["resnet18", "resnet50"])
def test_resnet_archs(arch):
    params = jres.init_params(jax.random.PRNGKey(0), arch, num_classes=5)
    x = jnp.zeros((1, 64, 64, 3))
    logits, _ = jres.forward(params, x, arch)
    assert logits.shape == (1, 5)
    feats, _ = jres.forward_features(params, x, arch)
    assert feats.shape == (1, jres.n_features(arch))


def test_densenet121_runs():
    params = jdense.init_params(jax.random.PRNGKey(0), "densenet121")
    x = jnp.zeros((1, 64, 64, 3))
    feats, _ = jdense.forward_features(params, x, "densenet121")
    assert feats.shape == (1, 1024)


def test_num_params_vit_b32():
    cfg = CLIPConfig.vit_b32()
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    n = jclip.num_params(params)
    # CLIP ViT-B/32 is ~151M parameters
    assert 150e6 < n < 153e6, n
