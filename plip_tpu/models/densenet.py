"""Functional JAX DenseNet (torchvision-compatible weights).

The mudipath baseline embedder wraps a headless DenseNet-121
(`/root/reference/reproducibility/embedders/mudipath.py:89-133`: torchvision
``densenet121`` features + ReLU + global average pool, 1024-d output, with
multi-task-digital-pathology pretrained weights loaded by URL). This is the
TPU-native tower; weights import via :func:`from_torch_state_dict` from either
torchvision's or mtdp's state_dict naming (mudipath.py:43-46 strips prefixes
the same way).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .resnet import _init_bn, _init_conv, batch_norm, conv

Params = Dict[str, Any]

ARCHS = {
    "densenet121": {"growth": 32, "blocks": [6, 12, 24, 16], "init_feats": 64},
    "densenet169": {"growth": 32, "blocks": [6, 12, 32, 32], "init_feats": 64},
    "densenet201": {"growth": 32, "blocks": [6, 12, 48, 32], "init_feats": 64},
}


def _dense_layer(x, p, training):
    """BN-ReLU-Conv1x1(4g) - BN-ReLU-Conv3x3(g); concat onto input."""
    stats = {}
    y, stats["norm1"] = batch_norm(x, p["norm1"], training)
    y = jax.nn.relu(y)
    y = conv(y, p["conv1"], 1, 0)
    y, stats["norm2"] = batch_norm(y, p["norm2"], training)
    y = jax.nn.relu(y)
    y = conv(y, p["conv2"], 1, 1)
    return jnp.concatenate([x, y], axis=-1), stats


def _transition(x, p, training):
    stats = {}
    y, stats["norm"] = batch_norm(x, p["norm"], training)
    y = jax.nn.relu(y)
    y = conv(y, p["conv"], 1, 0)
    # 2x2 average pool stride 2
    y = jax.lax.reduce_window(
        y, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0
    return y, stats


def forward_features(
    params: Params, x: jnp.ndarray, arch: str = "densenet121", training: bool = False
) -> Tuple[jnp.ndarray, Params]:
    """NHWC image -> pooled features [B, C] (headless: the reference's
    NoHeadDenseNet forward, mudipath.py:125-130)."""
    spec = ARCHS[arch]
    stats: Params = {}
    y = conv(x, params["conv0"], 2, 3)
    y, stats["norm0"] = batch_norm(y, params["norm0"], training)
    y = jax.nn.relu(y)
    y = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    n_blocks = len(spec["blocks"])
    for bi, n_layers in enumerate(spec["blocks"]):
        lstats = []
        for li in range(n_layers):
            y, s = _dense_layer(y, params[f"denseblock{bi+1}"][li], training)
            lstats.append(s)
        stats[f"denseblock{bi+1}"] = lstats
        if bi < n_blocks - 1:
            y, s = _transition(y, params[f"transition{bi+1}"], training)
            stats[f"transition{bi+1}"] = s
    y, stats["norm5"] = batch_norm(y, params["norm5"], training)
    y = jax.nn.relu(y)
    feats = jnp.mean(y, axis=(1, 2))
    return feats, stats


def n_features(arch: str = "densenet121") -> int:
    spec = ARCHS[arch]
    c = spec["init_feats"]
    for bi, n_layers in enumerate(spec["blocks"]):
        c += n_layers * spec["growth"]
        if bi < len(spec["blocks"]) - 1:
            c //= 2
    return c


def init_params(key, arch: str = "densenet121") -> Params:
    spec = ARCHS[arch]
    g = spec["growth"]
    keys = iter(jax.random.split(key, 1024))
    params: Params = {
        "conv0": _init_conv(next(keys), 7, 7, 3, spec["init_feats"]),
        "norm0": _init_bn(spec["init_feats"]),
    }
    c = spec["init_feats"]
    for bi, n_layers in enumerate(spec["blocks"]):
        layers: List[Params] = []
        for _ in range(n_layers):
            layers.append(
                {
                    "norm1": _init_bn(c),
                    "conv1": _init_conv(next(keys), 1, 1, c, 4 * g),
                    "norm2": _init_bn(4 * g),
                    "conv2": _init_conv(next(keys), 3, 3, 4 * g, g),
                }
            )
            c += g
        params[f"denseblock{bi+1}"] = layers
        if bi < len(spec["blocks"]) - 1:
            params[f"transition{bi+1}"] = {
                "norm": _init_bn(c),
                "conv": _init_conv(next(keys), 1, 1, c, c // 2),
            }
            c //= 2
    params["norm5"] = _init_bn(c)
    return params


def from_torch_state_dict(sd: Dict[str, Any], arch: str = "densenet121") -> Params:
    """Convert torchvision densenet state_dict. Accepts keys with or without
    the ``features.`` prefix and strips ``module.`` (the mtdp cleaning at
    mudipath.py:43-46)."""
    clean = {}
    for k, v in sd.items():
        v = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        for prefix in ("module.", "features."):
            if k.startswith(prefix):
                k = k[len(prefix):]
        clean[k] = v
    sd = clean
    spec = ARCHS[arch]

    def bn(prefix):
        return {
            "scale": sd[f"{prefix}.weight"],
            "bias": sd[f"{prefix}.bias"],
            "mean": sd[f"{prefix}.running_mean"],
            "var": sd[f"{prefix}.running_var"],
        }

    def cw(k):
        return sd[k].transpose(2, 3, 1, 0)

    params: Params = {"conv0": cw("conv0.weight"), "norm0": bn("norm0")}
    for bi, n_layers in enumerate(spec["blocks"]):
        layers = []
        for li in range(n_layers):
            pre = f"denseblock{bi+1}.denselayer{li+1}"
            layers.append(
                {
                    "norm1": bn(f"{pre}.norm1"),
                    "conv1": cw(f"{pre}.conv1.weight"),
                    "norm2": bn(f"{pre}.norm2"),
                    "conv2": cw(f"{pre}.conv2.weight"),
                }
            )
        params[f"denseblock{bi+1}"] = layers
        if bi < len(spec["blocks"]) - 1:
            pre = f"transition{bi+1}"
            params[pre] = {"norm": bn(f"{pre}.norm"), "conv": cw(f"{pre}.conv.weight")}
    params["norm5"] = bn("norm5")
    return jax.tree.map(jnp.asarray, params)
