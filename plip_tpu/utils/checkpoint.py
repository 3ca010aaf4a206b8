"""Checkpoint I/O: PyTorch→JAX weight converters + native save/load.

The reference exercises TWO PyTorch naming schemes for the same ViT-B/32
weights (SURVEY.md §5 checkpoint row), both of which import here:

- HF ``CLIPModel`` state_dict (used by `/root/reference/plip.py:26`)
- OpenAI ``clip`` state_dict (used by
  `/root/reference/reproducibility/embedders/factory.py:21-26`)

Native checkpoints are a flat ``.npz`` of '/'-joined tree paths plus a JSON
config blob — dependency-free, memory-mappable, and byte-deterministic.
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import CLIPConfig, TextConfig, VisionConfig

Params = Dict[str, Any]


def _np(x) -> np.ndarray:
    """torch tensor / array-like -> float32 numpy (host)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    x = np.asarray(x)
    if x.dtype == np.float16:
        x = x.astype(np.float32)
    return x


def _num_layers(keys, pattern: str) -> int:
    rx = re.compile(pattern)
    idx = [int(m.group(1)) for k in keys for m in [rx.match(k)] if m]
    return max(idx) + 1 if idx else 0


def _stack(layer_dicts):
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *layer_dicts)


# ---------------------------------------------------------------------------
# HF CLIPModel naming
# ---------------------------------------------------------------------------


def from_hf_clip(sd: Dict[str, Any]) -> Tuple[Params, CLIPConfig]:
    """Convert an HF ``CLIPModel.state_dict()`` to plip_tpu params."""
    sd = {k: _np(v) for k, v in sd.items()}
    v_width = sd["vision_model.embeddings.class_embedding"].shape[0]
    t_width = sd["text_model.embeddings.token_embedding.weight"].shape[1]
    vocab = sd["text_model.embeddings.token_embedding.weight"].shape[0]
    ctx = sd["text_model.embeddings.position_embedding.weight"].shape[0]
    patch = sd["vision_model.embeddings.patch_embedding.weight"].shape[-1]
    n_pos = sd["vision_model.embeddings.position_embedding.weight"].shape[0]
    grid = int(round((n_pos - 1) ** 0.5))
    embed_dim = sd["visual_projection.weight"].shape[0]
    v_layers = _num_layers(sd, r"vision_model\.encoder\.layers\.(\d+)\.")
    t_layers = _num_layers(sd, r"text_model\.encoder\.layers\.(\d+)\.")

    cfg = CLIPConfig(
        vision=VisionConfig(
            width=v_width, layers=v_layers, heads=max(1, v_width // 64),
            image_size=grid * patch, patch_size=patch,
        ),
        text=TextConfig(
            width=t_width, layers=t_layers, heads=max(1, t_width // 64),
            vocab_size=vocab, context_length=ctx,
        ),
        embed_dim=embed_dim,
    )

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    def hf_block(prefix):
        q_w, k_w, v_w = (sd[f"{prefix}.self_attn.{n}_proj.weight"] for n in "qkv")
        q_b, k_b, v_b = (sd[f"{prefix}.self_attn.{n}_proj.bias"] for n in "qkv")
        return {
            "ln1": ln(f"{prefix}.layer_norm1"),
            "attn": {
                "qkv": {
                    "kernel": np.concatenate([q_w.T, k_w.T, v_w.T], axis=1),
                    "bias": np.concatenate([q_b, k_b, v_b]),
                },
                "out": {
                    "kernel": sd[f"{prefix}.self_attn.out_proj.weight"].T,
                    "bias": sd[f"{prefix}.self_attn.out_proj.bias"],
                },
            },
            "ln2": ln(f"{prefix}.layer_norm2"),
            "mlp": {
                "fc1": {
                    "kernel": sd[f"{prefix}.mlp.fc1.weight"].T,
                    "bias": sd[f"{prefix}.mlp.fc1.bias"],
                },
                "fc2": {
                    "kernel": sd[f"{prefix}.mlp.fc2.weight"].T,
                    "bias": sd[f"{prefix}.mlp.fc2.bias"],
                },
            },
        }

    conv = sd["vision_model.embeddings.patch_embedding.weight"]  # [W, 3, P, P]
    patch_kernel = conv.transpose(2, 3, 1, 0).reshape(-1, v_width)

    params = {
        "visual": {
            "patch_embed": {"kernel": patch_kernel},
            "class_embedding": sd["vision_model.embeddings.class_embedding"],
            "pos_embed": sd["vision_model.embeddings.position_embedding.weight"],
            "ln_pre": ln("vision_model.pre_layrnorm"),  # sic — HF's own key name
            "blocks": _stack(
                [hf_block(f"vision_model.encoder.layers.{i}") for i in range(v_layers)]
            ),
            "ln_post": ln("vision_model.post_layernorm"),
            "proj": {"kernel": sd["visual_projection.weight"].T},
        },
        "text": {
            "token_embed": sd["text_model.embeddings.token_embedding.weight"],
            "pos_embed": sd["text_model.embeddings.position_embedding.weight"],
            "blocks": _stack(
                [hf_block(f"text_model.encoder.layers.{i}") for i in range(t_layers)]
            ),
            "ln_final": ln("text_model.final_layer_norm"),
            "proj": {"kernel": sd["text_projection.weight"].T},
        },
        "logit_scale": sd["logit_scale"].reshape(()),
    }
    return jax.tree.map(jnp.asarray, params), cfg


# ---------------------------------------------------------------------------
# OpenAI clip naming
# ---------------------------------------------------------------------------


def from_openai_clip(sd: Dict[str, Any]) -> Tuple[Params, CLIPConfig]:
    """Convert an OpenAI ``clip`` state_dict (the `vinid/plip` torch.save
    format loaded at factory.py:23-25) to plip_tpu params."""
    sd = {k: _np(v) for k, v in sd.items()}
    v_width = sd["visual.class_embedding"].shape[0]
    t_width = sd["token_embedding.weight"].shape[1]
    vocab = sd["token_embedding.weight"].shape[0]
    ctx = sd["positional_embedding"].shape[0]
    patch = sd["visual.conv1.weight"].shape[-1]
    n_pos = sd["visual.positional_embedding"].shape[0]
    grid = int(round((n_pos - 1) ** 0.5))
    embed_dim = sd["text_projection"].shape[1]
    v_layers = _num_layers(sd, r"visual\.transformer\.resblocks\.(\d+)\.")
    t_layers = _num_layers(sd, r"transformer\.resblocks\.(\d+)\.")

    cfg = CLIPConfig(
        vision=VisionConfig(
            width=v_width, layers=v_layers, heads=max(1, v_width // 64),
            image_size=grid * patch, patch_size=patch,
        ),
        text=TextConfig(
            width=t_width, layers=t_layers, heads=max(1, t_width // 64),
            vocab_size=vocab, context_length=ctx,
        ),
        embed_dim=embed_dim,
    )

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    def oa_block(prefix):
        return {
            "ln1": ln(f"{prefix}.ln_1"),
            "attn": {
                "qkv": {
                    "kernel": sd[f"{prefix}.attn.in_proj_weight"].T,  # rows q,k,v
                    "bias": sd[f"{prefix}.attn.in_proj_bias"],
                },
                "out": {
                    "kernel": sd[f"{prefix}.attn.out_proj.weight"].T,
                    "bias": sd[f"{prefix}.attn.out_proj.bias"],
                },
            },
            "ln2": ln(f"{prefix}.ln_2"),
            "mlp": {
                "fc1": {
                    "kernel": sd[f"{prefix}.mlp.c_fc.weight"].T,
                    "bias": sd[f"{prefix}.mlp.c_fc.bias"],
                },
                "fc2": {
                    "kernel": sd[f"{prefix}.mlp.c_proj.weight"].T,
                    "bias": sd[f"{prefix}.mlp.c_proj.bias"],
                },
            },
        }

    conv = sd["visual.conv1.weight"]  # [W, 3, P, P], bias=False
    patch_kernel = conv.transpose(2, 3, 1, 0).reshape(-1, v_width)

    params = {
        "visual": {
            "patch_embed": {"kernel": patch_kernel},
            "class_embedding": sd["visual.class_embedding"],
            "pos_embed": sd["visual.positional_embedding"],
            "ln_pre": ln("visual.ln_pre"),
            "blocks": _stack(
                [oa_block(f"visual.transformer.resblocks.{i}") for i in range(v_layers)]
            ),
            "ln_post": ln("visual.ln_post"),
            "proj": {"kernel": sd["visual.proj"]},  # already [width, embed]
        },
        "text": {
            "token_embed": sd["token_embedding.weight"],
            "pos_embed": sd["positional_embedding"],
            "blocks": _stack(
                [oa_block(f"transformer.resblocks.{i}") for i in range(t_layers)]
            ),
            "ln_final": ln("ln_final"),
            "proj": {"kernel": sd["text_projection"]},  # already [width, embed]
        },
        "logit_scale": sd["logit_scale"].reshape(()),
    }
    return jax.tree.map(jnp.asarray, params), cfg


def openai_sd_to_hf_sd(sd: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Re-key an OpenAI ``clip`` state_dict into HF ``CLIPModel`` naming.

    Used by the asset importer to verify OpenAI-named checkpoints
    (`/root/reference/reproducibility/embedders/factory.py:21-26`) against the
    one PyTorch reference implementation available offline — HF ``CLIPModel``
    — by loading the re-keyed dict into it. Fused ``in_proj`` splits into
    q/k/v rows; the two projection matrices transpose ([W,E] → [E,W])."""
    sd = {k: _np(v) for k, v in sd.items()}
    out: Dict[str, np.ndarray] = {"logit_scale": sd["logit_scale"]}

    def blocks(src_prefix: str, dst_prefix: str, n: int):
        for i in range(n):
            s, d = f"{src_prefix}.resblocks.{i}", f"{dst_prefix}.encoder.layers.{i}"
            w, b = sd[f"{s}.attn.in_proj_weight"], sd[f"{s}.attn.in_proj_bias"]
            width = w.shape[1]
            for j, name in enumerate(("q", "k", "v")):
                out[f"{d}.self_attn.{name}_proj.weight"] = w[j * width:(j + 1) * width]
                out[f"{d}.self_attn.{name}_proj.bias"] = b[j * width:(j + 1) * width]
            out[f"{d}.self_attn.out_proj.weight"] = sd[f"{s}.attn.out_proj.weight"]
            out[f"{d}.self_attn.out_proj.bias"] = sd[f"{s}.attn.out_proj.bias"]
            for src_ln, dst_ln in (("ln_1", "layer_norm1"), ("ln_2", "layer_norm2")):
                out[f"{d}.{dst_ln}.weight"] = sd[f"{s}.{src_ln}.weight"]
                out[f"{d}.{dst_ln}.bias"] = sd[f"{s}.{src_ln}.bias"]
            for src_fc, dst_fc in (("c_fc", "fc1"), ("c_proj", "fc2")):
                out[f"{d}.mlp.{dst_fc}.weight"] = sd[f"{s}.mlp.{src_fc}.weight"]
                out[f"{d}.mlp.{dst_fc}.bias"] = sd[f"{s}.mlp.{src_fc}.bias"]

    v_layers = _num_layers(sd, r"visual\.transformer\.resblocks\.(\d+)\.")
    t_layers = _num_layers(sd, r"transformer\.resblocks\.(\d+)\.")
    blocks("visual.transformer", "vision_model", v_layers)
    blocks("transformer", "text_model", t_layers)

    out["vision_model.embeddings.class_embedding"] = sd["visual.class_embedding"]
    out["vision_model.embeddings.patch_embedding.weight"] = sd["visual.conv1.weight"]
    out["vision_model.embeddings.position_embedding.weight"] = sd[
        "visual.positional_embedding"
    ]
    out["vision_model.pre_layrnorm.weight"] = sd["visual.ln_pre.weight"]
    out["vision_model.pre_layrnorm.bias"] = sd["visual.ln_pre.bias"]
    out["vision_model.post_layernorm.weight"] = sd["visual.ln_post.weight"]
    out["vision_model.post_layernorm.bias"] = sd["visual.ln_post.bias"]
    out["visual_projection.weight"] = sd["visual.proj"].T
    out["text_model.embeddings.token_embedding.weight"] = sd["token_embedding.weight"]
    out["text_model.embeddings.position_embedding.weight"] = sd["positional_embedding"]
    out["text_model.final_layer_norm.weight"] = sd["ln_final.weight"]
    out["text_model.final_layer_norm.bias"] = sd["ln_final.bias"]
    out["text_projection.weight"] = sd["text_projection"].T
    return out


def hf_sd_to_openai_sd(sd: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of :func:`openai_sd_to_hf_sd` — export HF-named weights in the
    OpenAI ``clip`` state_dict layout the repro harness's torch.save files use
    (`/root/reference/reproducibility/training_model/clip.py:221-222`)."""
    sd = {k: _np(v) for k, v in sd.items()}
    out: Dict[str, np.ndarray] = {"logit_scale": sd["logit_scale"]}

    def blocks(src_prefix: str, dst_prefix: str, n: int):
        for i in range(n):
            s, d = f"{src_prefix}.encoder.layers.{i}", f"{dst_prefix}.resblocks.{i}"
            out[f"{d}.attn.in_proj_weight"] = np.concatenate(
                [sd[f"{s}.self_attn.{n_}_proj.weight"] for n_ in ("q", "k", "v")], 0
            )
            out[f"{d}.attn.in_proj_bias"] = np.concatenate(
                [sd[f"{s}.self_attn.{n_}_proj.bias"] for n_ in ("q", "k", "v")], 0
            )
            out[f"{d}.attn.out_proj.weight"] = sd[f"{s}.self_attn.out_proj.weight"]
            out[f"{d}.attn.out_proj.bias"] = sd[f"{s}.self_attn.out_proj.bias"]
            for dst_ln, src_ln in (("ln_1", "layer_norm1"), ("ln_2", "layer_norm2")):
                out[f"{d}.{dst_ln}.weight"] = sd[f"{s}.{src_ln}.weight"]
                out[f"{d}.{dst_ln}.bias"] = sd[f"{s}.{src_ln}.bias"]
            for dst_fc, src_fc in (("c_fc", "fc1"), ("c_proj", "fc2")):
                out[f"{d}.mlp.{dst_fc}.weight"] = sd[f"{s}.mlp.{src_fc}.weight"]
                out[f"{d}.mlp.{dst_fc}.bias"] = sd[f"{s}.mlp.{src_fc}.bias"]

    v_layers = _num_layers(sd, r"vision_model\.encoder\.layers\.(\d+)\.")
    t_layers = _num_layers(sd, r"text_model\.encoder\.layers\.(\d+)\.")
    blocks("vision_model", "visual.transformer", v_layers)
    blocks("text_model", "transformer", t_layers)

    out["visual.class_embedding"] = sd["vision_model.embeddings.class_embedding"]
    out["visual.conv1.weight"] = sd["vision_model.embeddings.patch_embedding.weight"]
    out["visual.positional_embedding"] = sd[
        "vision_model.embeddings.position_embedding.weight"
    ]
    out["visual.ln_pre.weight"] = sd["vision_model.pre_layrnorm.weight"]
    out["visual.ln_pre.bias"] = sd["vision_model.pre_layrnorm.bias"]
    out["visual.ln_post.weight"] = sd["vision_model.post_layernorm.weight"]
    out["visual.ln_post.bias"] = sd["vision_model.post_layernorm.bias"]
    out["visual.proj"] = sd["visual_projection.weight"].T
    out["token_embedding.weight"] = sd["text_model.embeddings.token_embedding.weight"]
    out["positional_embedding"] = sd["text_model.embeddings.position_embedding.weight"]
    out["ln_final.weight"] = sd["text_model.final_layer_norm.weight"]
    out["ln_final.bias"] = sd["text_model.final_layer_norm.bias"]
    out["text_projection"] = sd["text_projection.weight"].T
    return out


# ---------------------------------------------------------------------------
# JAX → PyTorch export (round-5 interop: hand tuned weights BACK to the
# reference ecosystem)
# ---------------------------------------------------------------------------


def to_openai_sd(params: Params, cfg: CLIPConfig) -> Dict[str, np.ndarray]:
    """Export plip_tpu params as an OpenAI ``clip`` state_dict (numpy values).

    Exact inverse of :func:`from_openai_clip`: a model fine-tuned on TPU can
    be handed back to the reference's own eval harness, which loads tuned
    weights via ``torch.load`` + ``load_state_dict``
    (`/root/reference/reproducibility/embedders/factory.py:21-26`) in the
    same layout its trainer publishes per epoch
    (`/root/reference/reproducibility/training_model/clip.py:221-222`).

    Values are float32 (the published-checkpoint dtype); round-trip
    ``from_openai_clip(to_openai_sd(p, cfg))`` is bit-exact for fp32 params
    (pinned in tests/test_export_torch.py).
    """
    p = jax.tree.map(lambda x: np.asarray(jax.device_get(x), np.float32), params)
    W = cfg.vision.width
    P = cfg.vision.patch_size
    out: Dict[str, np.ndarray] = {
        "logit_scale": p["logit_scale"].reshape(())
    }

    def put_ln(dst: str, leaf) -> None:
        out[f"{dst}.weight"] = leaf["scale"]
        out[f"{dst}.bias"] = leaf["bias"]

    def put_blocks(dst_prefix: str, blocks) -> None:
        n = blocks["ln1"]["scale"].shape[0]  # stacked leading layer axis
        for i in range(n):
            blk = jax.tree.map(lambda x: x[i], blocks)
            d = f"{dst_prefix}.resblocks.{i}"
            out[f"{d}.attn.in_proj_weight"] = blk["attn"]["qkv"]["kernel"].T
            out[f"{d}.attn.in_proj_bias"] = blk["attn"]["qkv"]["bias"]
            out[f"{d}.attn.out_proj.weight"] = blk["attn"]["out"]["kernel"].T
            out[f"{d}.attn.out_proj.bias"] = blk["attn"]["out"]["bias"]
            put_ln(f"{d}.ln_1", blk["ln1"])
            put_ln(f"{d}.ln_2", blk["ln2"])
            out[f"{d}.mlp.c_fc.weight"] = blk["mlp"]["fc1"]["kernel"].T
            out[f"{d}.mlp.c_fc.bias"] = blk["mlp"]["fc1"]["bias"]
            out[f"{d}.mlp.c_proj.weight"] = blk["mlp"]["fc2"]["kernel"].T
            out[f"{d}.mlp.c_proj.bias"] = blk["mlp"]["fc2"]["bias"]

    vis = p["visual"]
    # inverse of conv.transpose(2, 3, 1, 0).reshape(-1, W) at import
    out["visual.conv1.weight"] = (
        vis["patch_embed"]["kernel"].reshape(P, P, 3, W).transpose(3, 2, 0, 1)
    )
    out["visual.class_embedding"] = vis["class_embedding"]
    out["visual.positional_embedding"] = vis["pos_embed"]
    put_ln("visual.ln_pre", vis["ln_pre"])
    put_blocks("visual.transformer", vis["blocks"])
    put_ln("visual.ln_post", vis["ln_post"])
    out["visual.proj"] = vis["proj"]["kernel"]  # [width, embed] both sides

    txt = p["text"]
    out["token_embedding.weight"] = txt["token_embed"]
    out["positional_embedding"] = txt["pos_embed"]
    put_blocks("transformer", txt["blocks"])
    put_ln("ln_final", txt["ln_final"])
    out["text_projection"] = txt["proj"]["kernel"]
    return out


def to_hf_sd(params: Params, cfg: CLIPConfig) -> Dict[str, np.ndarray]:
    """Export plip_tpu params as an HF ``CLIPModel`` state_dict (numpy).

    Composes the exact-inverse OpenAI exporter with the parity-tested
    re-keyer, so a TPU-tuned model loads into ``transformers.CLIPModel``
    (the reference's primary load path, `/root/reference/plip.py:26-27`)
    via ``load_state_dict``.
    """
    return openai_sd_to_hf_sd(to_openai_sd(params, cfg))


def save_torch_checkpoint(
    path: str, params: Params, cfg: CLIPConfig, naming: str = "openai"
) -> str:
    """``torch.save`` the exported state_dict (torch tensors) to ``path``.

    ``naming="openai"`` matches the reference trainer's per-epoch artifact
    (`/root/reference/reproducibility/training_model/clip.py:221-222`);
    ``naming="hf"`` loads directly into ``transformers.CLIPModel``.
    """
    import torch

    if naming == "openai":
        sd = to_openai_sd(params, cfg)
    elif naming == "hf":
        sd = to_hf_sd(params, cfg)
    else:
        raise ValueError(f"naming must be 'openai' or 'hf', got {naming!r}")
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, path)
    return path


def from_torch_state_dict(sd: Dict[str, Any]) -> Tuple[Params, CLIPConfig]:
    """Auto-detect HF vs OpenAI naming (the two load paths in the reference)."""
    if any(k.startswith("vision_model.") for k in sd):
        return from_hf_clip(sd)
    if any(k.startswith("visual.") for k in sd):
        return from_openai_clip(sd)
    raise ValueError(
        "Unrecognized state_dict naming: expected HF CLIPModel ('vision_model.*') "
        "or OpenAI clip ('visual.*') keys"
    )


def load_torch_checkpoint(path: str) -> Tuple[Params, CLIPConfig]:
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return from_torch_state_dict(sd)


# ---------------------------------------------------------------------------
# Native format (flat npz + json config)
# ---------------------------------------------------------------------------


def _flatten(tree: Params, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Params:
    tree: Params = {}
    for path, val in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return tree


def cfg_to_json(cfg: CLIPConfig) -> str:
    """CLIPConfig -> canonical JSON (shared by the npz and orbax formats)."""
    return json.dumps(
        {
            "vision": dataclasses.asdict(cfg.vision),
            "text": dataclasses.asdict(cfg.text),
            "embed_dim": cfg.embed_dim,
            "logit_scale_init": cfg.logit_scale_init,
            "logit_scale_max": cfg.logit_scale_max,
            "ln_eps": cfg.ln_eps,
        }
    )


def cfg_from_json(s: str) -> CLIPConfig:
    cfg_json = json.loads(s)
    return CLIPConfig(
        vision=VisionConfig(**cfg_json["vision"]),
        text=TextConfig(**cfg_json["text"]),
        embed_dim=cfg_json["embed_dim"],
        logit_scale_init=cfg_json["logit_scale_init"],
        logit_scale_max=cfg_json["logit_scale_max"],
        ln_eps=cfg_json["ln_eps"],
    )


def save_checkpoint(path: str, params: Params, cfg: CLIPConfig) -> None:
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    flat = _flatten(jax.tree.map(lambda x: np.asarray(x), params))
    cfg_json = cfg_to_json(cfg)
    np.savez(path, __config__=np.frombuffer(cfg_json.encode(), dtype=np.uint8), **flat)


def load_checkpoint(path: str) -> Tuple[Params, CLIPConfig]:
    data = np.load(path, allow_pickle=False)
    cfg = cfg_from_json(bytes(data["__config__"]).decode())
    flat = {k: data[k] for k in data.files if k != "__config__"}
    return _unflatten(flat), cfg
