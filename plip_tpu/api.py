"""Public PLIP API — TPU-native rebuild of `/root/reference/plip.py:11-118`.

Same surface: ``PLIP(model_name)``, ``encode_images(images, batch_size)``,
``encode_text(text, batch_size)``, ``zero_shot_classification(images,
text_labels)``, ``retrieval(queries, top_k)``. Differences by design:

- Embeddings are computed by the jitted JAX towers; per-call batches are
  padded to the batch size so every batch hits the same compiled executable
  (no recompiles, no dynamic shapes).
- ``encode_images`` returns **unnormalized** features, exactly like the
  reference (`/root/reference/README.md:28-30` has callers normalize).
- The reference's ``retrieval`` dereferences a never-set ``self.image_vectors``
  (`/root/reference/plip.py:114` — latent crash). Here the index is explicit:
  call ``build_image_index(images)`` (or assign ``image_vectors``) first;
  ``retrieval`` raises a clear error otherwise.
- Checkpoint resolution is offline-first: native ``.npz``, a PyTorch
  state_dict file in either naming scheme (HF CLIPModel / OpenAI clip), the
  ``PLIP_TPU_CHECKPOINT`` env var, or ``random:<arch>`` for a deterministic
  randomly initialized model (useful for benchmarking and testing in
  zero-egress environments).
"""

from __future__ import annotations

import os
import warnings
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .models import clip as jclip
from .models.config import ARCHITECTURES, CLIPConfig
from .ops.preprocess import preprocess_images
from .tokenizer import default_tokenizer
from .utils.checkpoint import load_checkpoint, load_torch_checkpoint


def _pad_to(x: np.ndarray, n: int) -> np.ndarray:
    if x.shape[0] == n:
        return x
    pad = np.zeros((n - x.shape[0],) + x.shape[1:], dtype=x.dtype)
    return np.concatenate([x, pad], axis=0)


class PLIP:
    """Pathology Language-Image Pretraining model, TPU-native.

    Parameters
    ----------
    model_name: checkpoint path (``.npz`` native / torch state_dict file),
        ``"random:ViT-B/32"`` style spec, or any string with the
        ``PLIP_TPU_CHECKPOINT`` env var pointing at a checkpoint.
    auth_token: accepted for signature parity with the reference; unused
        (no network access in this stack).
    dtype: compute dtype for the towers (``jnp.bfloat16`` recommended on TPU;
        params stay fp32).
    """

    def __init__(
        self,
        model_name: str = "vinid/plip",
        auth_token: Optional[str] = None,
        dtype=jnp.float32,
        tokenizer=None,
        mesh=None,
    ):
        del auth_token  # parity-only
        self.model_name = model_name
        self.dtype = dtype
        self.params, self.cfg = self._load_model(model_name)
        self.tokenizer = tokenizer if tokenizer is not None else default_tokenizer()
        self.image_vectors: Optional[np.ndarray] = None
        self.mesh = mesh
        if mesh is not None:
            # multi-chip inference: params replicated/tp-sharded per the
            # mesh rules; encode batches are dp-sharded in the encode loops
            from .parallel.mesh import shard_params

            self.params = shard_params(self.params, mesh)

        cfg = self.cfg

        @jax.jit
        def _encode_images(params, pixels):
            return jclip.encode_image(params, pixels, cfg, dtype=dtype)

        @jax.jit
        def _encode_text(params, ids):
            return jclip.encode_text(params, ids, cfg, dtype=dtype)

        self._encode_images_fn = _encode_images
        self._encode_text_fn = _encode_text

    # ------------------------------------------------------------------
    # Loading
    # ------------------------------------------------------------------

    @staticmethod
    def _load_model(model_name: str):
        if model_name.startswith("random:"):
            arch = model_name.split(":", 1)[1] or "ViT-B/32"
            cfg = ARCHITECTURES[arch]()
            params = jclip.init_params(jax.random.PRNGKey(0), cfg)
            return params, cfg
        candidates = [model_name, os.environ.get("PLIP_TPU_CHECKPOINT")]
        for cand in candidates:
            if cand and os.path.exists(cand):
                if cand.endswith(".npz"):
                    return load_checkpoint(cand)
                return load_torch_checkpoint(cand)
        warnings.warn(
            f"Checkpoint {model_name!r} not found locally and this environment "
            "has no network access; falling back to a deterministic random "
            "ViT-B/32. Set PLIP_TPU_CHECKPOINT or pass a local path for real "
            "weights."
        )
        cfg = CLIPConfig.vit_b32()
        return jclip.init_params(jax.random.PRNGKey(0), cfg), cfg

    def save(self, path: str) -> str:
        """Write the model to the native ``.npz`` checkpoint format."""
        from .utils.checkpoint import save_checkpoint

        save_checkpoint(path, jax.device_get(self.params), self.cfg)
        return path

    # ------------------------------------------------------------------
    # Encoding
    # ------------------------------------------------------------------

    def encode_images(
        self,
        images: Sequence,
        batch_size: int = 32,
        num_workers: int = 8,
    ) -> np.ndarray:
        """Images (paths / PIL / HWC arrays) -> unnormalized [N, embed_dim].

        Paths stream through the threaded decode loader (native libjpeg pool
        for JPEGs), overlapping host decode with device compute — the
        reference's version decodes synchronously on the main thread
        (plip.py:44, no workers).
        """
        from .data.datasets import ImageDataset
        from .data.loader import PrefetchLoader

        if len(images) == 0:
            return np.zeros((0, self.cfg.embed_dim), np.float32)
        batch_size = self._effective_batch(batch_size)
        ds = ImageDataset(list(images))
        loader = PrefetchLoader(
            ds,
            batch_size=batch_size,
            num_workers=num_workers,
            device_put=False,
            collate=lambda items, bs: list(items),  # preprocess groups shapes
        )
        outs = []
        for batch, n in loader:
            pixels = preprocess_images(batch)
            pad = batch_size - pixels.shape[0]
            if pad:
                pixels = jnp.pad(pixels, ((0, pad), (0, 0), (0, 0), (0, 0)))
            pixels = self._maybe_shard(pixels)
            emb = self._encode_images_fn(self.params, pixels)
            outs.append(np.asarray(emb)[:n])
        return np.concatenate(outs, axis=0)

    def _maybe_shard(self, batch):
        if self.mesh is None:
            return batch
        import jax

        from .parallel.mesh import batch_sharding

        return jax.device_put(batch, batch_sharding(self.mesh))

    def _effective_batch(self, batch_size: int) -> int:
        """Under a mesh, the compiled batch must divide evenly over dp."""
        if self.mesh is None:
            return batch_size
        dp = self.mesh.shape["dp"]
        return -(-batch_size // dp) * dp

    def encode_text(self, text: List[str], batch_size: int = 32) -> np.ndarray:
        """Texts -> unnormalized [N, embed_dim]."""
        if len(text) == 0:
            return np.zeros((0, self.cfg.embed_dim), np.float32)
        batch_size = self._effective_batch(batch_size)
        ids = self.tokenizer.tokenize(list(text), self.cfg.text.context_length)
        outs = []
        for i in range(0, len(text), batch_size):
            chunk = ids[i : i + batch_size]
            n = chunk.shape[0]
            padded = _pad_to(chunk, batch_size)
            if n < batch_size:
                # pad rows must still contain an EOT so pooling is well-defined
                padded[n:, 0] = self.tokenizer.sot_token
                padded[n:, 1] = self.tokenizer.eot_token
            emb = self._encode_text_fn(
                self.params, self._maybe_shard(jnp.asarray(padded))
            )
            outs.append(np.asarray(emb)[:n])
        return np.concatenate(outs, axis=0)

    # ------------------------------------------------------------------
    # Similarity / retrieval (numpy host math, matching plip.py:73-117)
    # ------------------------------------------------------------------

    def _cosine_similarity(
        self, key_vectors: np.ndarray, space_vectors: np.ndarray, normalize: bool = True
    ) -> np.ndarray:
        if normalize:
            key_vectors = key_vectors / np.linalg.norm(
                key_vectors, ord=2, axis=-1, keepdims=True
            )
        return np.matmul(key_vectors, space_vectors.T)

    def _nearest_neighbours(
        self, k: int, key_vectors, space_vectors, normalize: bool = True
    ) -> np.ndarray:
        key_vectors = np.asarray(key_vectors)
        space_vectors = np.asarray(space_vectors)
        cosine_sim = self._cosine_similarity(key_vectors, space_vectors, normalize=normalize)
        return cosine_sim.argsort()[:, -k:][:, ::-1]

    def zero_shot_classification(
        self, images: Sequence, text_labels: List[str], batch_size: int = 8
    ) -> List[str]:
        """Zero-shot classification; argmax over label-text similarity."""
        text_vectors = self.encode_text(text_labels, batch_size=batch_size)
        image_vectors = self.encode_images(images, batch_size=batch_size)
        cosine_sim = self._cosine_similarity(image_vectors, text_vectors)
        preds = np.argmax(cosine_sim, axis=-1)
        return [text_labels[idx] for idx in preds]

    def build_image_index(self, images: Sequence, batch_size: int = 32) -> np.ndarray:
        """Encode and store the retrieval corpus (fixes plip.py:114)."""
        self.image_vectors = self.encode_images(images, batch_size=batch_size)
        return self.image_vectors

    def retrieval(self, queries: List[str], top_k: int = 10) -> np.ndarray:
        """Text->image retrieval over the built index: [Q, top_k] indices."""
        if self.image_vectors is None:
            raise RuntimeError(
                "No image index: call build_image_index(images) (or assign "
                "`image_vectors`) before retrieval(). The reference version "
                "crashes here on an unset attribute (plip.py:114); we make the "
                "contract explicit instead."
            )
        text_vectors = self.encode_text(queries, batch_size=8)
        return self._nearest_neighbours(
            k=top_k, key_vectors=text_vectors, space_vectors=self.image_vectors
        )
