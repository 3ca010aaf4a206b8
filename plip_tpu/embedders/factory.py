"""Embedder factory — rebuild of
`/root/reference/reproducibility/embedders/factory.py:10-47`.

Dispatch on ``args.model_name``:
- ``plip``: CLIP arch from $PC_CLIP_ARCH with fine-tuned weights loaded from
  ``args.backbone`` (factory.py:20-27) — here via the dual-naming torch
  converter or a native .npz
- ``clip``: base weights (factory.py:29-32); offline this falls back to the
  deterministic random init unless PLIP_TPU_CHECKPOINT points at base weights
- ``mudipath``: DenseNet-121 with mtdp weights (factory.py:34-47); offline
  loads ``args.backbone`` if it exists, else random init
"""

from __future__ import annotations

import os
from types import SimpleNamespace
from typing import Union

from ..api import PLIP
from .clip_embedder import CLIPEmbedder
from .mudipath import DenseNetEmbedder, build_densenet


class EmbedderFactory:
    def __init__(self):
        pass

    def factory(self, args: Union[SimpleNamespace, object]):
        name = args.model_name
        path = getattr(args, "backbone", "") or ""

        if name in ("plip", "clip"):
            arch = os.environ.get("PC_CLIP_ARCH", "ViT-B/32")
            if name == "plip" and path and os.path.exists(path):
                model = PLIP(path)
            elif name == "clip" and os.environ.get("PLIP_TPU_CHECKPOINT"):
                model = PLIP(os.environ["PLIP_TPU_CHECKPOINT"])
            else:
                model = PLIP(f"random:{arch}")
            return CLIPEmbedder(model, name, path)

        if name == "mudipath":
            weights = path if path and os.path.exists(path) else None
            params, arch = build_densenet(weights)
            return DenseNetEmbedder(params, arch, name, path)

        raise ValueError(f"unknown model_name {name!r}")
