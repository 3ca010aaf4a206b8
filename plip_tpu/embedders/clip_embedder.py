"""Cache-first CLIP embedder — rebuild of
`/root/reference/reproducibility/embedders/plip.py:9-75`.

Contract preserved:
- image path uses the raw-filename cache layout, text uses the sha256 cache
  (embedders/plip.py:17-35)
- outputs are **L2-normalized** float matrices (embedders/plip.py:52-53,
  73-74) — note this differs from the public API, which returns raw features

TPU-native internals: threaded decode loader feeding the jitted towers with
statically padded batches; device-side preprocessing.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

import jax.numpy as jnp

from ..data.datasets import ImageDataset
from ..data.loader import PrefetchLoader
from ..ops.preprocess import preprocess_images
from ..utils.cacher import (
    cache_hit_or_miss,
    cache_hit_or_miss_raw_filename,
    cache_numpy_object,
    cache_numpy_object_raw_filename,
)
from .abst import AbstractEmbedder


def _l2(x: np.ndarray) -> np.ndarray:
    return x / np.linalg.norm(x, axis=1, keepdims=True)


class CLIPEmbedder(AbstractEmbedder):
    """model: a plip_tpu.api.PLIP instance (any arch)."""

    def __init__(self, model, name: str, backbone: str):
        self.model = model
        self.name = name
        self.backbone = backbone

    # -- cache-first entry points (embedders/plip.py:17-35) ----------------

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
        emb = self.embed_images(
            list_of_images, num_workers=num_workers, batch_size=batch_size
        )
        cache_numpy_object_raw_filename(
            emb, self.name + "img" + additional_cache_name, self.backbone
        )
        return emb

    def text_embedder(
        self,
        list_of_labels: Sequence[str],
        device=None,
        num_workers: int = 1,
        batch_size: int = 32,
        additional_cache_name: str = "",
    ) -> np.ndarray:
        hit = cache_hit_or_miss(
            self.name + "txt" + additional_cache_name, self.backbone
        )
        if hit is not None:
            return hit
        emb = self.embed_text(list_of_labels, batch_size=batch_size)
        cache_numpy_object(emb, self.name + "txt" + additional_cache_name, self.backbone)
        return emb

    # -- compute paths ------------------------------------------------------

    def embed_images(
        self, list_of_images: Sequence, num_workers: int = 8, batch_size: int = 32
    ) -> np.ndarray:
        ds = ImageDataset(list_of_images)  # raw uint8 items, threaded decode
        loader = PrefetchLoader(
            ds,
            batch_size=batch_size,
            num_workers=num_workers,
            device_put=False,
            collate=lambda items, bs: list(items),  # preprocess groups shapes
        )
        outs: List[np.ndarray] = []
        for batch, n in loader:
            pixels = preprocess_images(batch)
            pad = batch_size - pixels.shape[0]
            if pad:
                pixels = jnp.pad(pixels, ((0, pad), (0, 0), (0, 0), (0, 0)))
            emb = self.model._encode_images_fn(self.model.params, pixels)
            outs.append(np.asarray(emb)[:n])
        return _l2(np.concatenate(outs, axis=0))

    def embed_text(self, list_of_labels: Sequence[str], batch_size: int = 32) -> np.ndarray:
        emb = self.model.encode_text(list(list_of_labels), batch_size=batch_size)
        return _l2(emb)
