"""W8A8 int8 inference quantization (ops/quant.py): numerics, dispatch
through layers.linear, layer-stacked scales, and the PLIP API flag."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig
from plip_tpu.models.layers import linear
from plip_tpu.ops.quant import (linear_w8a8, quantize_block_linears,
                                quantize_linear)


def _cos(a, b):
    a = np.asarray(a, np.float32).ravel()
    b = np.asarray(b, np.float32).ravel()
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def test_quantize_linear_numerics():
    rng = np.random.default_rng(0)
    p = {"kernel": jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32)),
         "bias": jnp.asarray(rng.standard_normal(32).astype(np.float32))}
    x = jnp.asarray(rng.standard_normal((8, 64)).astype(np.float32))
    q = quantize_linear(p)
    assert q["kernel_q"].dtype == jnp.int8
    assert q["wscale"].shape == (1, 32)
    y_ref = x @ p["kernel"] + p["bias"]
    y_q = linear_w8a8(x, q)
    assert _cos(y_ref, y_q) > 0.999


def test_linear_dispatches_on_kernel_q():
    rng = np.random.default_rng(1)
    p = {"kernel": jnp.asarray(rng.standard_normal((16, 16)).astype(np.float32))}
    x = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    q = quantize_linear(p)
    np.testing.assert_allclose(
        np.asarray(linear(x, q)), np.asarray(linear_w8a8(x, q)))
    # and the fp32 path is untouched
    np.testing.assert_allclose(
        np.asarray(linear(x, p)), np.asarray(x @ p["kernel"]), rtol=1e-6)


def test_layer_stacked_scales():
    """Block stacks carry a leading layer axis; scales must be per (layer,
    out-channel), reducing only over the input axis."""
    rng = np.random.default_rng(2)
    w = rng.standard_normal((3, 8, 4)).astype(np.float32)
    w[1] *= 100.0  # one layer much larger — must not clip the others
    q = quantize_linear({"kernel": jnp.asarray(w)})
    assert q["wscale"].shape == (3, 1, 4)
    deq = np.asarray(q["kernel_q"], np.float32) * np.asarray(q["wscale"])
    assert _cos(w, deq) > 0.999


def test_quantized_tower_embeddings_close():
    cfg = CLIPConfig.tiny()
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    px = jnp.asarray(rng.standard_normal(
        (2, cfg.vision.image_size, cfg.vision.image_size, 3)).astype(np.float32))
    ref = np.asarray(jclip.encode_image(params, px, cfg))
    qparams = {**params,
               "visual": {**params["visual"],
                          "blocks": quantize_block_linears(
                              params["visual"]["blocks"])}}
    got = np.asarray(jclip.encode_image(qparams, px, cfg))
    for r, g in zip(ref, got):
        assert _cos(r, g) > 0.98


def test_api_quantize_flag_warns_below_l14(tmp_path):
    from plip_tpu.api import PLIP

    with pytest.warns(UserWarning, match="slower"):
        p = PLIP(model_name="random:ViT-B/32", quantize="w8a8")
    # bf16 path kept: fp32 kernels still present
    assert "kernel" in p.params["visual"]["blocks"]["attn"]["qkv"]

    with pytest.raises(ValueError):
        PLIP(model_name="random:ViT-B/32", quantize="int4")


def test_api_quantize_with_mesh():
    """quantize must compose with mesh sharding (shard first, then quantize:
    the fixed spec tree only matches the fp32 structure)."""
    from plip_tpu.api import PLIP
    from plip_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(dp=4, tp=2)
    p = PLIP(model_name="random:ViT-L/14", mesh=mesh, quantize="w8a8")
    blocks = p.params["visual"]["blocks"]
    assert blocks["attn"]["qkv"]["kernel_q"].dtype == jnp.int8
    emb = p.encode_images([np.zeros((224, 224, 3), np.uint8)] * 4,
                          batch_size=4)
    assert emb.shape == (4, 768) and np.isfinite(emb).all()


def test_api_quantize_applies_at_l14_width():
    from plip_tpu.api import PLIP

    p = PLIP(model_name="random:ViT-L/14", quantize="w8a8")
    blocks = p.params["visual"]["blocks"]
    assert "kernel_q" in blocks["attn"]["qkv"]
    assert blocks["attn"]["qkv"]["kernel_q"].dtype == jnp.int8
    # embeddings still finite through the dispatching linear
    emb = p.encode_images(
        [np.zeros((224, 224, 3), np.uint8)], batch_size=1)
    assert np.isfinite(emb).all()


def test_api_quantize_visual_only():
    """ADVICE r2: the +14% W8A8 measurement is image-encode only; the L/14
    text tower (S=77, fused-sublayer eligible) must stay bf16/fp32 so
    encode_text keeps the measured fused kernel path."""
    from plip_tpu.api import PLIP

    p = PLIP(model_name="random:ViT-L/14", quantize="w8a8")
    assert "kernel_q" in p.params["visual"]["blocks"]["attn"]["qkv"]
    assert "kernel" in p.params["text"]["blocks"]["attn"]["qkv"]
    assert "kernel_q" not in p.params["text"]["blocks"]["attn"]["qkv"]
