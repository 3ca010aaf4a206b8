"""MuDiPath (DenseNet) embedder — rebuild of
`/root/reference/reproducibility/embedders/mudipath.py:15-217`.

The reference builds a headless torchvision DenseNet-121 with
multi-task-digital-pathology weights fetched from hardcoded uliege dox URLs
(mudipath.py:66-68, 120-122 — unusable offline) and mirrors CLIPEmbedder's
caching (mudipath.py:187-215). Here the tower is the functional JAX DenseNet
(models/densenet.py), weights load from a local torch state_dict path (both
torchvision and mtdp 'module./features.' naming handled by the converter),
and preprocessing uses ImageNet stats (factory.py:41-46).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..data.datasets import ImageDataset
from ..data.loader import PrefetchLoader
from ..models import densenet as jdense
from ..ops.preprocess import IMAGENET_MEAN, IMAGENET_STD, preprocess_images
from ..utils.cacher import (
    cache_hit_or_miss,
    cache_hit_or_miss_raw_filename,
    cache_numpy_object,
    cache_numpy_object_raw_filename,
)
from .abst import AbstractEmbedder


def build_resnet(
    weights_path: Optional[str] = None, arch: str = "resnet50", seed: int = 0
):
    """(params, arch) — headless ResNet, the NoHeadResNet analog
    (mudipath.py:49-86): features + global average pool via
    models.resnet.forward_features."""
    from ..models import resnet as jres

    if weights_path:
        import torch

        sd = torch.load(weights_path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        params = jres.from_torch_state_dict(sd, arch)
    else:
        params = jres.init_params(jax.random.PRNGKey(seed), arch)
    return params, arch


def build_densenet(
    weights_path: Optional[str] = None, arch: str = "densenet121", seed: int = 0
):
    """(params, arch) — from a local state_dict if given, else random init.

    Replaces the reference's ``build_densenet(download_dir, pretrained='mtdp')``
    URL fetch (mudipath.py:103-122) with offline loading.
    """
    if weights_path:
        import torch

        sd = torch.load(weights_path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        params = jdense.from_torch_state_dict(sd, arch)
    else:
        params = jdense.init_params(jax.random.PRNGKey(seed), arch)
    return params, arch


class DenseNetEmbedder(AbstractEmbedder):
    def __init__(self, params, arch: str, name: str, backbone: str):
        self.params = params
        self.arch = arch
        self.name = name
        self.backbone = backbone

        @jax.jit
        def _features(params, pixels):
            feats, _ = jdense.forward_features(params, pixels, arch, training=False)
            return feats

        self._features = _features

    def image_embedder(
        self,
        list_of_images: Sequence,
        device=None,
        num_workers: int = 8,
        batch_size: int = 32,
        additional_cache_name: str = "",
    ) -> np.ndarray:
        hit = cache_hit_or_miss_raw_filename(
            self.name + "img" + additional_cache_name, self.backbone
        )
        if hit is not None:
            return hit
        emb = self.embed_images(list_of_images, num_workers=num_workers, batch_size=batch_size)
        cache_numpy_object_raw_filename(
            emb, self.name + "img" + additional_cache_name, self.backbone
        )
        return emb

    def text_embedder(self, *args, **kwargs):
        raise NotImplementedError(
            "DenseNet embedder has no text tower (mudipath is image-only; "
            "the reference's DenseNetEmbedder likewise lacks text_embedder)"
        )

    def embed_images(
        self, list_of_images: Sequence, num_workers: int = 8, batch_size: int = 32
    ) -> np.ndarray:
        ds = ImageDataset(list_of_images)
        loader = PrefetchLoader(
            ds,
            batch_size=batch_size,
            num_workers=num_workers,
            device_put=False,
            collate=lambda items, bs: list(items),
        )
        outs: List[np.ndarray] = []
        for batch, n in loader:
            pixels = preprocess_images(batch, mean=IMAGENET_MEAN, std=IMAGENET_STD)
            pad = batch_size - pixels.shape[0]
            if pad:
                pixels = jnp.pad(pixels, ((0, pad), (0, 0), (0, 0), (0, 0)))
            feats = self._features(self.params, pixels)
            outs.append(np.asarray(feats)[:n])
        emb = np.concatenate(outs, axis=0)
        return emb / np.linalg.norm(emb, axis=1, keepdims=True)
