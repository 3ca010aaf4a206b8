"""Standalone ViT image classifier (torchvision-``vit_b_16/32`` shaped).

The reference fine-tunes torchvision ViTs as supervised baselines
(`/root/reference/reproducibility/fine_tuning/finetune.py:102-112`:
``vit_b_16``/``vit_b_32`` with the classification head replaced). Graph:
conv patchify (with bias) → CLS + learned pos-embed → pre-LN encoder with
exact GELU, LN eps 1e-6 → final LN → head on the CLS token.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from .clip import patchify
from .config import VisionConfig
from .layers import _init_linear, _init_ln, init_block_stack, layer_norm, transformer

Params = Dict[str, Any]

ARCHS = {
    "vit_b_16": VisionConfig(width=768, layers=12, heads=12, image_size=224, patch_size=16),
    "vit_b_32": VisionConfig(width=768, layers=12, heads=12, image_size=224, patch_size=32),
}

LN_EPS = 1e-6


def init_params(key: jax.Array, arch: str, num_classes: int) -> Params:
    cfg = ARCHS[arch]
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    patch_dim = cfg.patch_size * cfg.patch_size * 3
    return {
        "patch_embed": _init_linear(k1, patch_dim, cfg.width, cfg.width ** -0.5),
        "class_token": jnp.zeros((cfg.width,), jnp.float32),
        "pos_embed": jax.random.normal(k2, (cfg.seq_len, cfg.width), jnp.float32) * 0.02,
        "blocks": init_block_stack(k3, cfg.layers, cfg.width),
        "ln_final": _init_ln(cfg.width),
        "head": _init_linear(k4, cfg.width, num_classes, 0.02),
    }


def forward(
    params: Params, pixels: jnp.ndarray, arch: str, dtype=jnp.float32, remat: bool = False
) -> jnp.ndarray:
    """NHWC pixels -> logits [B, num_classes]."""
    cfg = ARCHS[arch]
    x = patchify(pixels.astype(dtype), cfg.patch_size)
    x = (
        jnp.dot(x, params["patch_embed"]["kernel"].astype(dtype),
                preferred_element_type=jnp.float32)
        + params["patch_embed"]["bias"]
    ).astype(dtype)
    cls = jnp.broadcast_to(params["class_token"].astype(dtype), (x.shape[0], 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"].astype(dtype)
    x = transformer(
        x, params["blocks"], cfg.heads, causal=False, eps=LN_EPS, remat=remat, act="gelu"
    )
    x = layer_norm(x[:, 0], params["ln_final"], LN_EPS)
    logits = x @ params["head"]["kernel"] + params["head"]["bias"]
    return logits.astype(jnp.float32)
