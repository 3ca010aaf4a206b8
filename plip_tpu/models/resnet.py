"""Functional JAX ResNet (torchvision-compatible weights).

Needed for the reference's fine-tune backbones (resnet18/50/101 at
`/root/reference/reproducibility/fine_tuning/finetune.py:82-101`) and as the
ResNet half of the mudipath baseline
(`/root/reference/reproducibility/embedders/mudipath.py:49-86` — headless
features + global average pool).

TPU-native notes: NHWC layout throughout; conv via ``lax.conv_general_dilated``
with fp32 accumulation; BatchNorm is functional — inference mode folds into a
scale/shift (fused by XLA into the conv epilogue), train mode returns updated
running stats explicitly.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

ARCHS = {
    "resnet18": {"block": "basic", "layers": [2, 2, 2, 2]},
    "resnet34": {"block": "basic", "layers": [3, 4, 6, 3]},
    "resnet50": {"block": "bottleneck", "layers": [3, 4, 6, 3]},
    "resnet101": {"block": "bottleneck", "layers": [3, 4, 23, 3]},
}


def conv(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1, padding: int = 0) -> jnp.ndarray:
    """NHWC conv, weights HWIO, fp32 accumulation."""
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def batch_norm(
    x: jnp.ndarray,
    p: Params,
    training: bool = False,
    momentum: float = 0.1,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, Params]:
    """Functional BN. Returns (y, new_stats). Inference mode = scale/shift."""
    if training:
        axes = (0, 1, 2)
        mean = jnp.mean(x.astype(jnp.float32), axes)
        var = jnp.var(x.astype(jnp.float32), axes)
        new_stats = {
            "mean": (1 - momentum) * p["mean"] + momentum * mean,
            "var": (1 - momentum) * p["var"] + momentum * var,
        }
    else:
        mean, var = p["mean"], p["var"]
        new_stats = {"mean": p["mean"], "var": p["var"]}
    inv = jax.lax.rsqrt(var + eps) * p["scale"]
    y = (x.astype(jnp.float32) - mean) * inv + p["bias"]
    return y.astype(x.dtype), new_stats


def _basic_block(x, p, stride, training):
    stats = {}
    y = conv(x, p["conv1"], stride, 1)
    y, stats["bn1"] = batch_norm(y, p["bn1"], training)
    y = jax.nn.relu(y)
    y = conv(y, p["conv2"], 1, 1)
    y, stats["bn2"] = batch_norm(y, p["bn2"], training)
    if "downsample" in p:
        sc = conv(x, p["downsample"]["conv"], stride, 0)
        sc, stats["downsample"] = batch_norm(sc, p["downsample"]["bn"], training)
        stats["downsample"] = {"bn": stats["downsample"]}
    else:
        sc = x
    return jax.nn.relu(y + sc), stats


def _bottleneck_block(x, p, stride, training):
    stats = {}
    y = conv(x, p["conv1"], 1, 0)
    y, stats["bn1"] = batch_norm(y, p["bn1"], training)
    y = jax.nn.relu(y)
    y = conv(y, p["conv2"], stride, 1)
    y, stats["bn2"] = batch_norm(y, p["bn2"], training)
    y = jax.nn.relu(y)
    y = conv(y, p["conv3"], 1, 0)
    y, stats["bn3"] = batch_norm(y, p["bn3"], training)
    if "downsample" in p:
        sc = conv(x, p["downsample"]["conv"], stride, 0)
        sc, ds = batch_norm(sc, p["downsample"]["bn"], training)
        stats["downsample"] = {"bn": ds}
    else:
        sc = x
    return jax.nn.relu(y + sc), stats


def forward_features(
    params: Params,
    x: jnp.ndarray,
    arch: str = "resnet50",
    training: bool = False,
) -> Tuple[jnp.ndarray, Params]:
    """NHWC image -> pooled features [B, C]. Returns (features, bn_stats)."""
    spec = ARCHS[arch]
    block_fn = _basic_block if spec["block"] == "basic" else _bottleneck_block
    stats: Params = {}
    y = conv(x, params["conv1"], 2, 3)
    y, stats["bn1"] = batch_norm(y, params["bn1"], training)
    y = jax.nn.relu(y)
    # 3x3 max pool, stride 2, pad 1
    y = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    for li, n_blocks in enumerate(spec["layers"]):
        layer_stats = []
        for bi in range(n_blocks):
            stride = 2 if (li > 0 and bi == 0) else 1
            y, bstats = block_fn(y, params[f"layer{li+1}"][bi], stride, training)
            layer_stats.append(bstats)
        stats[f"layer{li+1}"] = layer_stats
    feats = jnp.mean(y, axis=(1, 2))  # global average pool
    return feats, stats


def forward(params, x, arch="resnet50", training=False):
    """Features + linear head (if params has 'fc')."""
    feats, stats = forward_features(params, x, arch, training)
    if "fc" in params:
        feats = feats @ params["fc"]["kernel"] + params["fc"]["bias"]
    return feats, stats


def merge_bn_stats(params: Params, stats: Params) -> Params:
    """Fold the running-stat updates returned by :func:`forward` (training
    mode) back into the parameter tree — the functional equivalent of torch
    BN buffers updating in-place under ``model.train()``
    (`/root/reference/reproducibility/fine_tuning/finetune.py:282-296`)."""
    if isinstance(stats, list):
        return [merge_bn_stats(p, s) for p, s in zip(params, stats)]
    if isinstance(stats, dict):
        if set(stats.keys()) == {"mean", "var"}:
            return {**params, "mean": stats["mean"], "var": stats["var"]}
        out = dict(params)
        for k, s in stats.items():
            out[k] = merge_bn_stats(params[k], s)
        return out
    return params


# ---------------------------------------------------------------------------
# Init + torchvision state_dict converter
# ---------------------------------------------------------------------------


def _init_conv(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    return jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * np.sqrt(2.0 / fan_in)


def _init_bn(c):
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def init_params(key, arch: str = "resnet50", num_classes: Optional[int] = None) -> Params:
    spec = ARCHS[arch]
    basic = spec["block"] == "basic"
    expansion = 1 if basic else 4
    keys = iter(jax.random.split(key, 512))
    params: Params = {"conv1": _init_conv(next(keys), 7, 7, 3, 64), "bn1": _init_bn(64)}
    cin = 64
    width = 64
    for li, n_blocks in enumerate(spec["layers"]):
        blocks: List[Params] = []
        for bi in range(n_blocks):
            stride = 2 if (li > 0 and bi == 0) else 1
            cout = width * expansion
            p: Params = {}
            if basic:
                p["conv1"] = _init_conv(next(keys), 3, 3, cin, width)
                p["bn1"] = _init_bn(width)
                p["conv2"] = _init_conv(next(keys), 3, 3, width, width)
                p["bn2"] = _init_bn(width)
            else:
                p["conv1"] = _init_conv(next(keys), 1, 1, cin, width)
                p["bn1"] = _init_bn(width)
                p["conv2"] = _init_conv(next(keys), 3, 3, width, width)
                p["bn2"] = _init_bn(width)
                p["conv3"] = _init_conv(next(keys), 1, 1, width, cout)
                p["bn3"] = _init_bn(cout)
            if stride != 1 or cin != cout:
                p["downsample"] = {
                    "conv": _init_conv(next(keys), 1, 1, cin, cout),
                    "bn": _init_bn(cout),
                }
            blocks.append(p)
            cin = cout
        params[f"layer{li+1}"] = blocks
        width *= 2
    if num_classes:
        params["fc"] = {
            "kernel": jax.random.normal(next(keys), (cin, num_classes), jnp.float32)
            * 0.01,
            "bias": jnp.zeros((num_classes,), jnp.float32),
        }
    return params


def n_features(arch: str) -> int:
    return 512 if ARCHS[arch]["block"] == "basic" else 2048


def _cw(w) -> np.ndarray:
    """torch conv weight OIHW -> HWIO."""
    return np.asarray(w).transpose(2, 3, 1, 0)


def from_torch_state_dict(
    sd: Dict[str, Any], arch: str, include_fc: bool = False
) -> Params:
    """Convert a torchvision resnet state_dict (keys conv1.weight, bn1.*,
    layerN.M.convK/bnK/downsample.{0,1})."""
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v) for k, v in sd.items()}
    spec = ARCHS[arch]

    def bn(prefix):
        return {
            "scale": sd[f"{prefix}.weight"],
            "bias": sd[f"{prefix}.bias"],
            "mean": sd[f"{prefix}.running_mean"],
            "var": sd[f"{prefix}.running_var"],
        }

    params: Params = {"conv1": _cw(sd["conv1.weight"]), "bn1": bn("bn1")}
    n_convs = 2 if spec["block"] == "basic" else 3
    for li, n_blocks in enumerate(spec["layers"]):
        blocks = []
        for bi in range(n_blocks):
            pre = f"layer{li+1}.{bi}"
            p: Params = {}
            for ci in range(1, n_convs + 1):
                p[f"conv{ci}"] = _cw(sd[f"{pre}.conv{ci}.weight"])
                p[f"bn{ci}"] = bn(f"{pre}.bn{ci}")
            if f"{pre}.downsample.0.weight" in sd:
                p["downsample"] = {
                    "conv": _cw(sd[f"{pre}.downsample.0.weight"]),
                    "bn": bn(f"{pre}.downsample.1"),
                }
            blocks.append(p)
        params[f"layer{li+1}"] = blocks
    if include_fc and "fc.weight" in sd:
        params["fc"] = {"kernel": sd["fc.weight"].T, "bias": sd["fc.bias"]}
    return jax.tree.map(jnp.asarray, params)
