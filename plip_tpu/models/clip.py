"""TPU-native CLIP dual encoder (pure-functional JAX).

Rebuilds the behavior contract the reference inherits from HF ``CLIPModel``
and OpenAI ``clip`` (SURVEY.md §2.2 N1/N2):

- ``encode_image`` == ``CLIPModel.get_image_features`` (`/root/reference/plip.py:50`):
  patchify → +CLS → +pos → ln_pre → 12 pre-LN blocks → take CLS → ln_post →
  linear proj. Output is **unnormalized** (the reference README has callers
  normalize; `/root/reference/README.md:28-30`).
- ``encode_text`` == ``get_text_features`` (`/root/reference/plip.py:68`):
  token+pos embed → causal blocks → ln_final → pool at EOT → proj.
- ``forward`` == HF ``model(**inputs)`` logits: L2-normalize both embeddings,
  ``logit_scale.exp() * img @ txt.T`` (`/root/reference/README.md:45-51`).

TPU-first choices: patchify is a reshape + single MXU matmul (equivalent to
the stride-32 conv, but expressed as the matmul it is); block params are
layer-stacked and scanned; all shapes static.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .config import CLIPConfig
from .layers import (
    _init_ln,
    init_block_stack,
    layer_norm,
    transformer,
)

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_params(key: jax.Array, cfg: CLIPConfig) -> Params:
    kv, kt, kvp, ktp, kcls, kpos_v, ktok, kpos_t, kproj_v, kproj_t = jax.random.split(key, 10)
    v, t = cfg.vision, cfg.text
    patch_dim = v.patch_size * v.patch_size * 3
    return {
        "visual": {
            "patch_embed": {
                # no bias — matches conv1(bias=False) / patch_embedding(bias=False)
                "kernel": jax.random.normal(kvp, (patch_dim, v.width), jnp.float32)
                * (v.width ** -0.5)
            },
            "class_embedding": jax.random.normal(kcls, (v.width,), jnp.float32)
            * (v.width ** -0.5),
            "pos_embed": jax.random.normal(kpos_v, (v.seq_len, v.width), jnp.float32)
            * (v.width ** -0.5),
            "ln_pre": _init_ln(v.width),
            "blocks": init_block_stack(kv, v.layers, v.width),
            "ln_post": _init_ln(v.width),
            "proj": {
                "kernel": jax.random.normal(kproj_v, (v.width, cfg.embed_dim), jnp.float32)
                * (v.width ** -0.5)
            },
        },
        "text": {
            "token_embed": jax.random.normal(ktok, (t.vocab_size, t.width), jnp.float32)
            * 0.02,
            "pos_embed": jax.random.normal(kpos_t, (t.context_length, t.width), jnp.float32)
            * 0.01,
            "blocks": init_block_stack(kt, t.layers, t.width),
            "ln_final": _init_ln(t.width),
            "proj": {
                "kernel": jax.random.normal(kproj_t, (t.width, cfg.embed_dim), jnp.float32)
                * (t.width ** -0.5)
            },
        },
        "logit_scale": jnp.asarray(cfg.logit_scale_init, jnp.float32),
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def patchify(pixels: jnp.ndarray, patch: int) -> jnp.ndarray:
    """NHWC image -> [B, tokens, patch*patch*C] (row-major patch order).

    Equivalent to a stride-``patch`` conv (the torch towers' conv1) but
    expressed as the reshape+matmul it really is — XLA tiles the single big
    matmul straight onto the MXU.
    """
    B, H, W, C = pixels.shape
    gh, gw = H // patch, W // patch
    x = pixels.reshape(B, gh, patch, gw, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, gh, gw, ph, pw, C]
    return x.reshape(B, gh * gw, patch * patch * C)


def encode_image(
    params: Params,
    pixels: jnp.ndarray,
    cfg: CLIPConfig,
    dtype: jnp.dtype = jnp.float32,
    remat: bool = False,
) -> jnp.ndarray:
    """pixels NHWC [B, S, S, 3] (already CLIP-normalized) -> [B, embed_dim]."""
    v = cfg.vision
    p = params["visual"]
    x = patchify(pixels.astype(dtype), v.patch_size)
    x = jnp.dot(
        x, p["patch_embed"]["kernel"].astype(dtype), preferred_element_type=jnp.float32
    ).astype(dtype)
    cls = jnp.broadcast_to(
        p["class_embedding"].astype(dtype), (x.shape[0], 1, v.width)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["pos_embed"].astype(dtype)
    x = layer_norm(x, p["ln_pre"], cfg.ln_eps)
    x = transformer(x, p["blocks"], v.heads, causal=False, eps=cfg.ln_eps, remat=remat)
    x = layer_norm(x[:, 0], p["ln_post"], cfg.ln_eps)
    out = jnp.dot(
        x, p["proj"]["kernel"].astype(dtype), preferred_element_type=jnp.float32
    )
    return out.astype(jnp.float32)


def causal_mask(n: int) -> jnp.ndarray:
    return jnp.triu(jnp.full((n, n), -jnp.inf, jnp.float32), k=1)


def encode_text(
    params: Params,
    ids: jnp.ndarray,
    cfg: CLIPConfig,
    dtype: jnp.dtype = jnp.float32,
    remat: bool = False,
) -> jnp.ndarray:
    """ids int32 [B, ctx] -> [B, embed_dim]. Pools at the first EOT token."""
    t = cfg.text
    p = params["text"]
    x = p["token_embed"].astype(dtype)[ids]
    x = x + p["pos_embed"].astype(dtype)
    # Causal pad to a multiple of 8 tokens: under the causal mask, rows
    # < ctx never attend the zero pad rows, so real-token outputs are
    # BIT-EXACT (verified, bench_text_pad.py cosine 1.000000) — and the
    # aligned S lets the flat sublayer kernels pick block_b=4 instead of
    # the 8 that 77∤8 forces (measured 18.0k vs 17.4k texts/s at b1024).
    S = x.shape[1]
    pad = (-S) % 8
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    x = transformer(
        x, p["blocks"], t.heads, causal=True, eps=cfg.ln_eps, remat=remat
    )
    if pad:
        x = x[:, :S]
    x = layer_norm(x, p["ln_final"], cfg.ln_eps)
    eot_pos = jnp.argmax((ids == t.eot).astype(jnp.int32), axis=-1)
    pooled = x[jnp.arange(x.shape[0]), eot_pos]
    out = jnp.dot(
        pooled, p["proj"]["kernel"].astype(dtype), preferred_element_type=jnp.float32
    )
    return out.astype(jnp.float32)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize with torch ``F.normalize`` semantics (eps=1e-12 floor on
    the norm): a zero embedding — e.g. an all-black padded image through a
    zero-bias path — yields a zero output instead of NaN logits in
    ``forward``. Contract: the normalize behind
    `/root/reference/reproducibility/training_model/clip.py:178-189`."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    if eps:
        n = jnp.maximum(n, eps)
    return x / n


def forward(
    params: Params,
    pixels: jnp.ndarray,
    ids: jnp.ndarray,
    cfg: CLIPConfig,
    dtype: jnp.dtype = jnp.float32,
    remat: bool = False,
):
    """Full CLIP forward: (logits_per_image, logits_per_text).

    ``remat`` may be a single policy or an ``(image, text)`` pair — the
    towers' best backward structures differ (the whole-block kernel wins
    only where the composed/XLA mix is weak; see PERF.md round 3)."""
    r_img, r_txt = remat if isinstance(remat, tuple) else (remat, remat)
    img = l2_normalize(encode_image(params, pixels, cfg, dtype, r_img))
    txt = l2_normalize(encode_text(params, ids, cfg, dtype, r_txt))
    scale = jnp.exp(
        jnp.clip(params["logit_scale"], max=cfg.logit_scale_max)
    ).astype(jnp.float32)
    logits_per_image = scale * img @ txt.T
    return logits_per_image, logits_per_image.T


def num_params(params: Params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))
