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


def _pil_fixed(path: str, n_px: int) -> np.ndarray:
    """PIL fallback for a failed fast-lane slot: bicubic shortest-side resize
    to ``n_px`` + center crop (the eval-transform geometry,
    `/root/reference/reproducibility/embedders/transform.py:45-52`)."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    w, h = img.size
    scale = n_px / min(w, h)
    rw = max(n_px, round(w * scale))
    rh = max(n_px, round(h * scale))
    if (rw, rh) != (w, h):
        img = img.resize((rw, rh), Image.BICUBIC)
    left, top = (rw - n_px) // 2, (rh - n_px) // 2
    return np.asarray(img.crop((left, top, left + n_px, top + n_px)), np.uint8)


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
    quantize: ``"w8a8"`` converts the transformer-block linears to int8
        weights with dynamic int8 activations (inference-only). Measured
        +14% at ViT-L/14 with embedding cosine ≥ 0.9998; *slower* at
        ViT-B/32 — see ops/quant.py. Ignored (with a warning) for B-width
        models.
    """

    def __init__(
        self,
        model_name: str = "vinid/plip",
        auth_token: Optional[str] = None,
        dtype=jnp.float32,
        tokenizer=None,
        mesh=None,
        quantize: Optional[str] = None,
    ):
        del auth_token  # parity-only
        if quantize is not None and quantize != "w8a8":
            # validate before the (expensive) weight init / mesh sharding
            raise ValueError(f"unknown quantize mode {quantize!r}")
        self.model_name = model_name
        self.dtype = dtype
        self.params, self.cfg = self._load_model(model_name)
        self.tokenizer = tokenizer if tokenizer is not None else default_tokenizer()
        self.image_vectors = None  # property: assignment resets _index_quantize
        self.mesh = mesh
        if mesh is not None:
            # multi-chip inference: params replicated/tp-sharded per the
            # mesh rules; encode batches are dp-sharded in the encode loops
            from .parallel.mesh import shard_params

            self.params = shard_params(self.params, mesh)
        if quantize is not None:
            # after mesh placement: shard_params' spec tree matches the fp32
            # structure, and the int8 kernels inherit the tp sharding of the
            # fp32 kernels they're derived from
            if self.cfg.vision.width < 1024:
                warnings.warn(
                    "quantize='w8a8' measured slower than bf16 below ViT-L/14 "
                    "width (PERF.md); keeping the bf16 path."
                )
            else:
                # Quantize the VISUAL blocks only: the measured win is the
                # image tower (r4, on the pipelined core: L/14 +33% at b32,
                # @336 +15% at b16; wide composed matmuls). The L/14 text
                # tower (S=77, width 768) is fused-sublayer eligible —
                # quantizing it would kick encode_text onto composed W8A8,
                # an unmeasured path, for ~no FLOP share. ops/quant.py.
                from .ops.quant import quantize_block_linears

                self.params = {
                    **self.params,
                    "visual": {**self.params["visual"],
                               "blocks": quantize_block_linears(
                                   self.params["visual"]["blocks"])},
                }

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

    def save(self, path: str, format: str = "npz") -> str:
        """Write the model checkpoint.

        format="npz" (default): the native flat-npz format.
        format="openai": ``torch.save`` of an OpenAI ``clip`` state_dict —
        the artifact the reference's trainer publishes and its eval harness
        consumes (`/root/reference/reproducibility/embedders/factory.py:21-26`,
        `training_model/clip.py:221-222`), so TPU-tuned weights round-trip
        back into the reference ecosystem.
        format="hf": ``torch.save`` of an HF ``CLIPModel`` state_dict
        (loads via ``CLIPModel.load_state_dict``, the `vinid/plip` publishing
        layout of `/root/reference/plip.py:26-27`).
        """
        if format == "npz":
            from .utils.checkpoint import save_checkpoint

            save_checkpoint(path, jax.device_get(self.params), self.cfg)
            return path
        if format in ("openai", "hf"):
            from .utils.checkpoint import save_torch_checkpoint

            return save_torch_checkpoint(path, self.params, self.cfg, naming=format)
        raise ValueError(f"format must be 'npz', 'openai' or 'hf', got {format!r}")

    # ------------------------------------------------------------------
    # Encoding
    # ------------------------------------------------------------------

    def encode_images(
        self,
        images: Sequence,
        batch_size: int = 32,
        num_workers: int = 8,
        decode_mode: str = "fast",
    ) -> np.ndarray:
        """Images (paths / PIL / HWC arrays) -> unnormalized [N, embed_dim].

        decode_mode="fast" (default): when every input is a JPEG path and the
        native pool is built, whole batches decode through the C++
        ``decode_batch_fixed`` fast lane — libjpeg decode + threaded resize
        straight into one fixed [B, 224, 224, 3] buffer, with per-slot PIL
        fallback for non-JPEG/corrupt files. For pre-tiled 224x224 datasets
        (all the reference's validation sets) the fast lane is BIT-EXACT (no
        resampling happens). Slots the native decoder had to RESAMPLE
        (source dims != 224²) are detected per batch and re-decoded with
        PIL's bicubic — the exact geometry of the reference transform
        (`/root/reference/reproducibility/embedders/transform.py:45-52`) —
        so non-tiled data can never silently miss the 0.999-cosine contract.

        decode_mode="fast_approx": keep the native DCT-scaling + host
        bilinear result for resampled slots (cosine > 0.995 on natural
        images, documented approximation) — maximum host throughput for
        callers that opt out of exactness. Warns once per call batch when
        resampling actually occurred.

        decode_mode="exact": per-item full-resolution decode + the
        device-side PIL-quantization-exact bicubic pipeline (the fidelity
        reference).

        Either way host decode overlaps device compute — the reference decodes
        synchronously on the main thread (plip.py:44, no workers).
        """
        if len(images) == 0:
            return np.zeros((0, self.cfg.embed_dim), np.float32)
        from . import native

        if (
            decode_mode in ("fast", "fast_approx")
            and native.available()
            and all(
                isinstance(im, str) and im.lower().endswith((".jpg", ".jpeg"))
                for im in images
            )
        ):
            return self._encode_images_fast(
                list(images), batch_size, num_workers,
                exact_resample=decode_mode == "fast",
            )
        return self._encode_images_exact(list(images), batch_size, num_workers)

    def _encode_images_exact(self, images, batch_size, num_workers):
        from .data.datasets import ImageDataset
        from .data.loader import PrefetchLoader

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

    def _encode_images_fast(self, paths, batch_size, num_workers,
                            exact_resample: bool = True):
        """decode_batch_fixed fast lane (VERDICT r1 #6): batched C++ decode
        into the device-native [B, 224, 224, 3] uint8 layout, double-buffered
        against device compute; failed slots re-decode via PIL.

        ``exact_resample`` (the ``decode_mode="fast"`` contract): slots the
        native decoder resampled (status == 1 — source dims != target, so
        the approximate DCT-scaling + bilinear path ran) are re-decoded with
        PIL bicubic, the reference transform's exact geometry. Disabled by
        ``decode_mode="fast_approx"``, which instead warns once per call
        that resampling occurred."""
        import concurrent.futures

        from . import native
        from .models.config import CLIP_IMAGE_MEAN  # noqa: F401  (doc anchor)
        from .ops.preprocess import preprocess_batch

        n_px = self.cfg.vision.image_size
        batch_size = self._effective_batch(batch_size)
        warned = [False]

        def decode(chunk):
            batch, status = native.decode_batch_fixed(
                chunk, shorter=n_px, crop=n_px, threads=num_workers
            )
            for i, rc in enumerate(status):
                if rc < 0 or (rc == 1 and exact_resample):
                    batch[i] = _pil_fixed(chunk[i], n_px)
            if not exact_resample and not warned[0] and (status == 1).any():
                warned[0] = True
                warnings.warn(
                    "decode_mode='fast_approx' resampled non-224x224 inputs "
                    "with the approximate bilinear path (cosine > 0.995, "
                    "below the 0.999 contract); use decode_mode='fast' or "
                    "'exact' for bicubic-exact embeddings."
                )
            return batch

        outs = []
        with concurrent.futures.ThreadPoolExecutor(1) as pool:
            chunks = [paths[i : i + batch_size] for i in range(0, len(paths), batch_size)]
            fut = pool.submit(decode, chunks[0])
            for ci, chunk in enumerate(chunks):
                batch = fut.result()
                if ci + 1 < len(chunks):
                    fut = pool.submit(decode, chunks[ci + 1])
                n = batch.shape[0]
                if n < batch_size:
                    batch = _pad_to(batch, batch_size)
                pixels = self._maybe_shard(preprocess_batch(batch))
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

    def build_image_index(
        self, images: Sequence, batch_size: int = 32,
        quantize: "bool | str" = False,
    ) -> np.ndarray:
        """Encode and store the retrieval corpus (fixes plip.py:114).

        quantize: ``"int8"`` (or True) stores the DEVICE copy of the index
        as per-row-scaled int8 (``ops.retrieval.quantize_rows``): 4× less
        HBM and faster scans at WSI scale. The fp32 vectors stay on the
        host and the device top-k is followed by an exact host rescore of
        4×top_k oversampled candidates in the reference's raw-space
        semantics (plip.py:73-76) — NEAR-exact overall: the true ranking
        is returned whenever the true top-k survives candidate selection
        (measured parity 1.000; see ops/retrieval.py for the precise
        guarantee, and use the default fp32 index for strict exactness).
        Only the device backend is affected; the host backend always uses
        the exact fp32 vectors.
        """
        return self.set_image_index(
            self.encode_images(images, batch_size=batch_size), quantize
        )

    @property
    def image_vectors(self):
        """The retrieval corpus (the reference's documented pattern is plain
        attribute assignment). Assigning here RESETS any int8 device-index
        mode from a previous ``build_image_index(..., quantize="int8")`` —
        a directly-assigned corpus must not silently inherit the quantized
        path (ADVICE r4). Use ``set_image_index`` to choose quantization."""
        return self._image_vectors

    @image_vectors.setter
    def image_vectors(self, vectors):
        self._image_vectors = vectors
        self._index_quantize = False

    def set_image_index(self, vectors, quantize: "bool | str" = False):
        """Install PRECOMPUTED embeddings as the retrieval corpus.

        Equivalent to assigning ``image_vectors`` (the reference's implicit
        pattern behind plip.py:114) but explicit, and the only public way to
        request an int8 device index (see ``build_image_index``) for a
        corpus embedded elsewhere — e.g. ``data.wsi.embed_wsi`` tiles or a
        cache-loaded embedding matrix.
        """
        if quantize not in (False, True, "int8"):
            raise ValueError(
                f"unknown quantize {quantize!r} (expected False or 'int8')"
            )
        self.image_vectors = vectors
        self._index_quantize = "int8" if quantize is True else quantize
        return self.image_vectors

    def retrieval(
        self, queries: List[str], top_k: int = 10, backend: str = "auto"
    ) -> np.ndarray:
        """Text->image retrieval over the built index: [Q, top_k] indices.

        backend: "host" = numpy argsort over the full [Q, N] score matrix
        (reference semantics, plip.py:78-87); "device" = streaming MXU
        top-k that never materializes [Q, N] (ops/retrieval.py — the
        WSI-scale path; identical scores and queries-only normalization,
        but EXACT ties rank earliest-index-first on device while the host
        argsort's tie order is unstable); "auto" = device when an
        accelerator is present and the index is large enough for the host
        matmul to matter, else host.

        If the index was built with ``build_image_index(quantize="int8")``,
        the device backend streams the int8 copy (4× less HBM) and restores
        the exact fp32 ranking by re-scoring 4×top_k oversampled candidates
        against the host-side fp32 vectors (PERF.md: ranking parity 1.000,
        4M-row indexes on one chip).
        """
        if self.image_vectors is None:
            raise RuntimeError(
                "No image index: call build_image_index(images) (or assign "
                "`image_vectors`) before retrieval(). The reference version "
                "crashes here on an unset attribute (plip.py:114); we make the "
                "contract explicit instead."
            )
        if backend not in ("auto", "host", "device"):
            raise ValueError(
                f"unknown retrieval backend {backend!r} "
                "(expected 'auto', 'host', or 'device')"
            )
        text_vectors = self.encode_text(queries, batch_size=8)
        n = np.shape(self.image_vectors)[0]  # no D2H copy for device indexes
        if backend == "auto":
            # Measured crossover (experiments/bench_retrieval.py, v5e, D=512
            # k=10): host matmul+argsort costs ~N·Q/30k ms plus an argsort
            # term that reaches 62 ms at N=262k even for Q=1; a device
            # one-shot costs ~1-9 ms compute + one host↔device round trip
            # (26 ms on this tunneled rig — the dominant term). Device wins
            # at N≥262144 for any Q, and from N·Q ≥ ~1M below that
            # (e.g. N=16k Q=64: 35 ms host vs 28 ms device). On a directly
            # attached TPU the round trip is sub-ms and the device path wins
            # from N≈16k at any Q; this gate is the conservative setting.
            q = np.shape(text_vectors)[0]
            backend = (
                "device"
                if jax.default_backend() != "cpu"
                and (n >= 262144 or n * q >= 1 << 20)
                else "host"
            )
        if backend == "device":
            from .ops.retrieval import cosine_topk, cosine_topk_int8, quantize_rows

            quant = getattr(self, "_index_quantize", False)
            # keep the corpus device-resident across calls, PRE-PADDED to a
            # chunk multiple: one H2D upload per index, not per query batch
            # (WSI-scale indexes are GBs and H2D is the wall on tunneled
            # rigs), and no transient re-pad copy per call — at the
            # near-HBM-capacity indexes int8 enables, a per-call 2× copy
            # could itself OOM
            chunk = 8192
            if quant and self.mesh is not None:
                # the dp-mesh stream pads per shard — pre-pad to its unit
                # so no per-call index copy is made (ops.retrieval)
                from .ops.retrieval import mesh_pad_rows

                pad = mesh_pad_rows(n, self.mesh.shape["dp"], chunk) - n
            else:
                pad = (-(-n // min(chunk, n)) * min(chunk, n)) - n
            key = (id(self.image_vectors), n, quant)
            if getattr(self, "_device_index_key", None) != key:
                if quant:
                    q8, inv = quantize_rows(self.image_vectors, normalize=False)
                    if pad:
                        q8 = np.pad(q8, ((0, pad), (0, 0)))
                        inv = np.pad(inv, (0, pad))
                    self._device_index = (jnp.asarray(q8), jnp.asarray(inv))
                else:
                    # jnp end-to-end: a device-resident corpus never makes
                    # a host round trip (pad runs on device, once per index)
                    xv = jnp.asarray(self.image_vectors, jnp.float32)
                    if pad:
                        xv = jnp.pad(xv, ((0, pad), (0, 0)))
                    self._device_index = xv
                self._device_index_key = key
            if quant:
                # raw-space rows quantized as-is; exact host rescore restores
                # the reference ranking/scores (see build_image_index). With
                # a mesh the int8 rows shard over dp and candidates gather
                # over ICI before the host rescore.
                idx, _ = cosine_topk_int8(
                    text_vectors, self._device_index[0], self._device_index[1],
                    k=top_k, rescore_vectors=self.image_vectors,
                    chunk=chunk, n_valid=n, mesh=self.mesh,
                )
                return idx
            if self.mesh is not None:
                # mesh path re-shards rows per device — pass the unpadded
                # count; it pads per shard itself
                idx, _ = cosine_topk(
                    text_vectors, self._device_index[:n], k=top_k,
                    normalize="queries", mesh=self.mesh,
                )
                return idx
            idx, _ = cosine_topk(
                text_vectors, self._device_index, k=top_k,
                normalize="queries", chunk=chunk, n_valid=n,
            )
            return idx
        return self._nearest_neighbours(
            k=top_k, key_vectors=text_vectors, space_vectors=self.image_vectors
        )
