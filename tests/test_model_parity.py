"""Golden numerics tests: our JAX dual encoder vs HF CLIPModel.

Constructs random-weight HF CLIPModels locally (no network), converts the
state_dict through both naming-scheme converters, and requires cosine
similarity ≥ 0.999 between embeddings (the BASELINE.json fidelity target) —
in practice we assert much tighter (≥0.99999 / atol) in fp32.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from plip_tpu.models import clip as jclip  # noqa: E402
from plip_tpu.utils.checkpoint import (  # noqa: E402
    from_hf_clip,
    from_openai_clip,
    load_checkpoint,
    save_checkpoint,
)

VOCAB = 64
CTX = 16


@pytest.fixture(scope="module")
def hf_model():
    cfg = transformers.CLIPConfig(
        text_config=dict(
            vocab_size=VOCAB,
            hidden_size=32,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            max_position_embeddings=CTX,
            hidden_act="quick_gelu",
            bos_token_id=0,
            eos_token_id=VOCAB - 1,  # EOT = highest id, as in the real vocab
        ),
        vision_config=dict(
            hidden_size=64,
            intermediate_size=256,
            num_hidden_layers=2,
            num_attention_heads=4,
            image_size=32,
            patch_size=16,
            hidden_act="quick_gelu",
        ),
        projection_dim=24,
    )
    torch.manual_seed(0)
    model = transformers.CLIPModel(cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def converted(hf_model):
    params, cfg = from_hf_clip(hf_model.state_dict())
    # heads aren't in the state_dict; patch in the true test-config values
    import dataclasses

    cfg = dataclasses.replace(
        cfg,
        vision=dataclasses.replace(cfg.vision, heads=4),
        text=dataclasses.replace(cfg.text, heads=4, eot_token=VOCAB - 1),
    )
    return params, cfg


def _rand_inputs(rng, batch=3):
    pixels = rng.standard_normal((batch, 32, 32, 3)).astype(np.float32)
    ids = np.zeros((batch, CTX), dtype=np.int64)
    for i in range(batch):
        n = rng.integers(3, CTX - 1)
        ids[i, 0] = 0
        ids[i, 1:n] = rng.integers(1, VOCAB - 2, n - 1)
        ids[i, n] = VOCAB - 1  # EOT = highest id
    return pixels, ids


def _cos(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))


def test_image_tower_parity(hf_model, converted):
    params, cfg = converted
    rng = np.random.default_rng(1)
    pixels, _ = _rand_inputs(rng)
    with torch.no_grad():
        ref = hf_model.get_image_features(
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2))
        ).numpy()
    ours = np.asarray(jclip.encode_image(params, jnp.asarray(pixels), cfg))
    assert _cos(ours, ref).min() > 0.99999
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_text_tower_parity(hf_model, converted):
    params, cfg = converted
    rng = np.random.default_rng(2)
    _, ids = _rand_inputs(rng)
    attn = np.ones_like(ids)
    with torch.no_grad():
        ref = hf_model.get_text_features(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(attn)
        ).numpy()
    ours = np.asarray(jclip.encode_text(params, jnp.asarray(ids), cfg))
    assert _cos(ours, ref).min() > 0.99999
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_logits_parity(hf_model, converted):
    params, cfg = converted
    rng = np.random.default_rng(3)
    pixels, ids = _rand_inputs(rng)
    with torch.no_grad():
        out = hf_model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(np.ones_like(ids)),
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2)),
        )
    li, lt = jclip.forward(params, jnp.asarray(pixels), jnp.asarray(ids), cfg)
    np.testing.assert_allclose(
        np.asarray(li), out.logits_per_image.numpy(), rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(lt), out.logits_per_text.numpy(), rtol=1e-4, atol=1e-3
    )


def test_openai_naming_converter(hf_model, converted):
    """Build an OpenAI-style state_dict from the HF weights; both converters
    must produce identical params."""
    hf_params, cfg = converted
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}

    oa = {}
    oa["logit_scale"] = sd["logit_scale"]
    oa["visual.conv1.weight"] = sd["vision_model.embeddings.patch_embedding.weight"]
    oa["visual.class_embedding"] = sd["vision_model.embeddings.class_embedding"]
    oa["visual.positional_embedding"] = sd[
        "vision_model.embeddings.position_embedding.weight"
    ]
    oa["visual.ln_pre.weight"] = sd["vision_model.pre_layrnorm.weight"]
    oa["visual.ln_pre.bias"] = sd["vision_model.pre_layrnorm.bias"]
    oa["visual.ln_post.weight"] = sd["vision_model.post_layernorm.weight"]
    oa["visual.ln_post.bias"] = sd["vision_model.post_layernorm.bias"]
    oa["visual.proj"] = sd["visual_projection.weight"].T
    oa["token_embedding.weight"] = sd["text_model.embeddings.token_embedding.weight"]
    oa["positional_embedding"] = sd["text_model.embeddings.position_embedding.weight"]
    oa["ln_final.weight"] = sd["text_model.final_layer_norm.weight"]
    oa["ln_final.bias"] = sd["text_model.final_layer_norm.bias"]
    oa["text_projection"] = sd["text_projection.weight"].T

    def copy_blocks(src_prefix, dst_prefix, n):
        for i in range(n):
            s, d = f"{src_prefix}.layers.{i}", f"{dst_prefix}.resblocks.{i}"
            oa[f"{d}.ln_1.weight"] = sd[f"{s}.layer_norm1.weight"]
            oa[f"{d}.ln_1.bias"] = sd[f"{s}.layer_norm1.bias"]
            oa[f"{d}.ln_2.weight"] = sd[f"{s}.layer_norm2.weight"]
            oa[f"{d}.ln_2.bias"] = sd[f"{s}.layer_norm2.bias"]
            oa[f"{d}.attn.in_proj_weight"] = np.concatenate(
                [sd[f"{s}.self_attn.{n_}_proj.weight"] for n_ in "qkv"], axis=0
            )
            oa[f"{d}.attn.in_proj_bias"] = np.concatenate(
                [sd[f"{s}.self_attn.{n_}_proj.bias"] for n_ in "qkv"]
            )
            oa[f"{d}.attn.out_proj.weight"] = sd[f"{s}.self_attn.out_proj.weight"]
            oa[f"{d}.attn.out_proj.bias"] = sd[f"{s}.self_attn.out_proj.bias"]
            oa[f"{d}.mlp.c_fc.weight"] = sd[f"{s}.mlp.fc1.weight"]
            oa[f"{d}.mlp.c_fc.bias"] = sd[f"{s}.mlp.fc1.bias"]
            oa[f"{d}.mlp.c_proj.weight"] = sd[f"{s}.mlp.fc2.weight"]
            oa[f"{d}.mlp.c_proj.bias"] = sd[f"{s}.mlp.fc2.bias"]

    copy_blocks("vision_model.encoder", "visual.transformer", cfg.vision.layers)
    copy_blocks("text_model.encoder", "transformer", cfg.text.layers)

    oa_params, oa_cfg = from_openai_clip(oa)
    assert oa_cfg.vision.width == cfg.vision.width
    flat_a = jax.tree.leaves(hf_params)
    flat_b = jax.tree.leaves(oa_params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_native_checkpoint_roundtrip(converted, tmp_path):
    params, cfg = converted
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, params, cfg)
    params2, cfg2 = load_checkpoint(path)
    assert cfg2 == cfg
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_mode_close(converted):
    """bf16 compute with fp32 LN/softmax islands stays close to fp32."""
    params, cfg = converted
    rng = np.random.default_rng(4)
    pixels, ids = _rand_inputs(rng)
    f32 = np.asarray(jclip.encode_image(params, jnp.asarray(pixels), cfg))
    bf16 = np.asarray(
        jclip.encode_image(params, jnp.asarray(pixels), cfg, dtype=jnp.bfloat16)
    )
    assert _cos(f32, bf16).min() > 0.995


def test_init_and_shapes():
    from plip_tpu.models.config import CLIPConfig

    cfg = CLIPConfig.tiny()
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    pixels = jnp.zeros((2, cfg.vision.image_size, cfg.vision.image_size, 3))
    ids = jnp.zeros((2, cfg.text.context_length), jnp.int32).at[:, 1].set(
        cfg.text.vocab_size - 1
    )
    img = jclip.encode_image(params, pixels, cfg)
    txt = jclip.encode_text(params, ids, cfg)
    assert img.shape == (2, cfg.embed_dim)
    assert txt.shape == (2, cfg.embed_dim)


def test_l2_normalize_zero_safe():
    """torch F.normalize parity (eps=1e-12): a zero embedding must produce a
    zero row, not NaN logits, through l2_normalize and forward."""
    import jax.numpy as jnp

    from plip_tpu.models.clip import l2_normalize

    z = l2_normalize(jnp.zeros((2, 8)))
    assert np.isfinite(np.asarray(z)).all()
    np.testing.assert_array_equal(np.asarray(z), np.zeros((2, 8), np.float32))
    # non-zero rows unaffected
    x = jnp.asarray(np.random.default_rng(0).standard_normal((3, 8)), jnp.float32)
    n = np.linalg.norm(np.asarray(l2_normalize(x)), axis=-1)
    np.testing.assert_allclose(n, 1.0, rtol=1e-6)
