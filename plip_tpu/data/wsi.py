"""Streaming WSI-tile pipeline — the TPU analog of "long context" in
pathology (SURVEY.md §5): gigapixel whole-slide images are handled by tiling
into 224×224 patches. The reference does this strictly *offline*
(preprocess_DigestPath.py's numpy stacks); here tiles stream straight from
the slide into the encoder with bounded memory — background filtering on the
fly, batches padded static, device compute overlapped with host tiling, and
optional dp-mesh sharding for multi-chip throughput.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np

from ..datagen.preprocess_digestpath import background_ratio


def iter_wsi_tiles(
    image,
    tile: int = 224,
    overlap: float = 0.0,
    downsample: int = 1,
    non_bg_threshold: float = 0.0,
    bg_pixel_threshold: int = 200,
) -> Iterator[Tuple[np.ndarray, Tuple[int, int]]]:
    """Lazily yield (tile [tile,tile,3] uint8, (y, x) in downsampled coords).

    image: numpy HWC uint8, PIL image, or path. Downsampling uses PIL for
    paths/PIL inputs, strided numpy (box-free) for arrays. Tiles whose tissue
    fraction (1 - background_ratio) falls below ``non_bg_threshold`` are
    skipped — the DigestPath filtering rule, applied streamingly.
    """
    if isinstance(image, str) or hasattr(image, "convert"):  # path or PIL
        from PIL import Image

        img = Image.open(image) if isinstance(image, str) else image
        if downsample != 1:
            img = img.resize(
                (
                    int(round(img.size[0] / downsample)),
                    int(round(img.size[1] / downsample)),
                )
            )
        arr = np.asarray(img.convert("RGB"))
    else:
        arr = np.asarray(image)
        if downsample != 1:
            arr = arr[::downsample, ::downsample]

    stride = max(1, int(tile * (1 - overlap)))
    for y in range(0, arr.shape[0] - tile + 1, stride):
        for x in range(0, arr.shape[1] - tile + 1, stride):
            patch = arr[y : y + tile, x : x + tile]
            if non_bg_threshold > 0:
                tissue = 1.0 - background_ratio(patch, bg_pixel_threshold)
                if tissue < non_bg_threshold:
                    continue
            yield patch, (y, x)


def embed_wsi(
    model,
    image,
    batch_size: int = 256,
    tile: int = 224,
    overlap: float = 0.0,
    downsample: int = 1,
    non_bg_threshold: float = 0.0,
    mesh=None,
    normalize: bool = True,
):
    """Stream a slide through the image tower.

    model: a plip_tpu.api.PLIP instance.
    Returns (embeddings [N, embed_dim] float32, coords [N, 2] int — (y, x)).

    With a mesh, batches are dp-sharded so tiles fan out across chips (the
    batch dim rides ICI); the host keeps exactly one batch in flight while the
    device works on the previous one (double buffering via dispatch-ahead).
    """
    from ..ops.preprocess import preprocess_batch

    if mesh is not None:
        from ..parallel.mesh import batch_sharding

        sharding = batch_sharding(mesh)
    else:
        sharding = None

    embs = []
    coords = []
    pending = []  # (device_embedding, n_valid) dispatched but not fetched

    def flush_one():
        emb_dev, n = pending.pop(0)
        embs.append(np.asarray(emb_dev)[:n])

    buf_tiles, buf_coords = [], []

    def dispatch():
        nonlocal buf_tiles, buf_coords
        n = len(buf_tiles)
        batch = np.stack(buf_tiles)
        if n < batch_size:
            pad = np.zeros((batch_size - n, tile, tile, 3), np.uint8)
            batch = np.concatenate([batch, pad])
        pixels = preprocess_batch(batch)
        if sharding is not None:
            import jax

            pixels = jax.device_put(pixels, sharding)
        emb = model._encode_images_fn(model.params, pixels)
        pending.append((emb, n))
        coords.extend(buf_coords)
        buf_tiles, buf_coords = [], []
        # keep at most 2 batches in flight (double buffering)
        while len(pending) > 2:
            flush_one()

    for patch, yx in iter_wsi_tiles(
        image, tile, overlap, downsample, non_bg_threshold
    ):
        buf_tiles.append(patch)
        buf_coords.append(yx)
        if len(buf_tiles) == batch_size:
            dispatch()
    if buf_tiles:
        dispatch()
    while pending:
        flush_one()

    if not embs:
        dim = model.cfg.embed_dim
        return np.zeros((0, dim), np.float32), np.zeros((0, 2), np.int64)
    out = np.concatenate(embs, axis=0)
    if normalize:
        out = out / np.linalg.norm(out, axis=1, keepdims=True)
    return out, np.asarray(coords, np.int64)
