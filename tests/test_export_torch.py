"""JAX→PyTorch checkpoint export (VERDICT r4 missing #1).

A model fine-tuned on TPU must round-trip back into the reference
ecosystem: its eval harness torch.loads state_dicts
(`/root/reference/reproducibility/embedders/factory.py:21-26`) in the
layout its trainer publishes
(`/root/reference/reproducibility/training_model/clip.py:221-222`).
Pins: (i) from_openai_clip(to_openai_sd(p)) == p bit-exactly, (ii) an HF
CLIPModel loaded with the exported dict reproduces plip_tpu embeddings at
the test_full_size_parity cosine bar, (iii) the CLI + PLIP.save e2e.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from plip_tpu.models import clip as jclip  # noqa: E402
from plip_tpu.models.config import CLIPConfig, TextConfig, VisionConfig  # noqa: E402
from plip_tpu.utils.checkpoint import (  # noqa: E402
    from_hf_clip,
    from_openai_clip,
    save_checkpoint,
    save_torch_checkpoint,
    to_hf_sd,
    to_openai_sd,
)


def _tiny_cfg():
    return CLIPConfig(
        vision=VisionConfig(width=128, layers=2, heads=2, image_size=224,
                            patch_size=32),
        # widths stay multiples of 64: the importers infer heads = width//64
        text=TextConfig(width=128, layers=2, heads=2, vocab_size=49408,
                        context_length=77),
        embed_dim=16,
    )


@pytest.fixture(scope="module")
def tiny():
    cfg = _tiny_cfg()
    params = jclip.init_params(jax.random.PRNGKey(7), cfg)
    return params, cfg


def _tree_equal(a, b):
    la, sa = jax.tree.flatten(a)
    lb, sb = jax.tree.flatten(b)
    assert sa == sb
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_openai_roundtrip_exact(tiny):
    params, cfg = tiny
    sd = to_openai_sd(params, cfg)
    p2, cfg2 = from_openai_clip(sd)
    assert cfg2 == cfg
    _tree_equal(params, p2)


def test_hf_roundtrip_exact(tiny):
    params, cfg = tiny
    p2, cfg2 = from_hf_clip(to_hf_sd(params, cfg))
    assert cfg2 == cfg
    _tree_equal(params, p2)


def test_exported_hf_dict_loads_into_clipmodel(tiny):
    """The exported dict must drive transformers.CLIPModel to the same
    embeddings as our towers (same bar as test_full_size_parity)."""
    params, cfg = tiny
    hf_cfg = transformers.CLIPConfig(
        vision_config=dict(
            hidden_size=cfg.vision.width,
            num_hidden_layers=cfg.vision.layers,
            num_attention_heads=cfg.vision.heads,
            intermediate_size=cfg.vision.width * 4,
            image_size=cfg.vision.image_size,
            patch_size=cfg.vision.patch_size,
        ),
        text_config=dict(
            hidden_size=cfg.text.width,
            num_hidden_layers=cfg.text.layers,
            num_attention_heads=cfg.text.heads,
            intermediate_size=cfg.text.width * 4,
            vocab_size=cfg.text.vocab_size,
            max_position_embeddings=cfg.text.context_length,
        ),
        projection_dim=cfg.embed_dim,
    )
    model = transformers.CLIPModel(hf_cfg).eval()
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in to_hf_sd(params, cfg).items()}
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected
    # only non-persistent-style buffers may be absent from an export
    assert all("position_ids" in k for k in missing), missing

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
    ids = np.zeros((2, 77), np.int64)
    ids[:, 0] = 49406
    ids[0, 1:4] = [320, 1125, 539]
    ids[0, 4] = 49407
    ids[1, 1:3] = [1000, 2000]
    ids[1, 3] = 49407

    with torch.no_grad():
        ref_img = model.get_image_features(
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2))
        ).numpy()
        ref_txt = model.get_text_features(
            input_ids=torch.from_numpy(ids)).numpy()
    our_img = np.asarray(jclip.encode_image(params, jnp.asarray(pixels), cfg))
    our_txt = np.asarray(jclip.encode_text(params, jnp.asarray(ids), cfg))

    def cos(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return np.sum(a * b, -1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))

    assert cos(our_img, ref_img).min() > 0.9999
    assert cos(our_txt, ref_txt).min() > 0.9999


def test_save_torch_checkpoint_and_cli(tiny, tmp_path):
    params, cfg = tiny
    # library path
    pt = save_torch_checkpoint(str(tmp_path / "m.pt"), params, cfg,
                               naming="openai")
    sd = torch.load(pt, map_location="cpu", weights_only=True)
    p2, cfg2 = from_openai_clip(sd)
    assert cfg2 == cfg
    _tree_equal(params, p2)

    # CLI path: native npz -> torch file (hf naming)
    npz = str(tmp_path / "m.npz")
    save_checkpoint(npz, params, cfg)
    from plip_tpu.scripts.export_checkpoint import main as export_main

    out = export_main([npz, str(tmp_path / "m_hf.pt"), "--naming", "hf"])
    sd_hf = torch.load(out, map_location="cpu", weights_only=True)
    p3, cfg3 = from_hf_clip(sd_hf)
    assert cfg3 == cfg
    _tree_equal(params, p3)


def test_plip_save_formats(tiny, tmp_path):
    params, cfg = tiny
    npz = str(tmp_path / "tiny.npz")
    save_checkpoint(npz, params, cfg)
    from plip_tpu.api import PLIP

    m = PLIP(npz)
    with pytest.raises(ValueError):
        m.save(str(tmp_path / "x.bin"), format="ggml")
    pt = m.save(str(tmp_path / "tuned.pt"), format="openai")
    p2, cfg2 = from_openai_clip(
        torch.load(pt, map_location="cpu", weights_only=True))
    assert cfg2 == cfg
    _tree_equal(params, p2)


def test_export_from_orbax_dir(tiny, tmp_path):
    """CLI export straight from an orbax train-state directory (params
    subtree only — no optimizer reconstruction)."""
    import optax

    from plip_tpu.train.contrastive import TrainState, save_train_state_orbax

    params, cfg = tiny
    opt = optax.adamw(1e-4)
    state = TrainState(params=params, opt_state=opt.init(params),
                       step=jnp.asarray(3, jnp.int32))
    ckdir = str(tmp_path / "state.orbax")
    save_train_state_orbax(ckdir, state, cfg)

    from plip_tpu.scripts.export_checkpoint import main as export_main

    out = export_main([ckdir, str(tmp_path / "from_orbax.pt")])
    p2, cfg2 = from_openai_clip(
        torch.load(out, map_location="cpu", weights_only=True))
    assert cfg2 == cfg
    _tree_equal(params, p2)
