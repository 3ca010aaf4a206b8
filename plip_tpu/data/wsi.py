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


def iter_wsi_pyramid(
    image,
    downsample_list=(2, 4, 8, 16, 32),
    tile: int = 224,
    overlap: float = 0.1,
    non_bg_threshold: float = 0.5,
    bg_pixel_threshold: int = 200,
) -> Iterator[Tuple[np.ndarray, Tuple[int, int, int]]]:
    """Stream the full multi-downsample sweep of one slide in one pass:
    lazily yield (tile uint8, (downsample, y, x)).

    The slide decodes ONCE; each pyramid level resizes from that decode with
    PIL bicubic. Tiling replicates the reference's offline sweep EXACTLY
    (`preprocess_DigestPath.py:36-108` / datagen.preprocess_digestpath.
    sliding_crop): float stride ``tile*(1-overlap)`` walked with np.arange
    (NOT an integer-stride grid — the grids diverge from the third tile on),
    tiles touching the far edge dropped (the reference's ``x2 >= H`` test),
    background = all-RGB>=200, keep tissue >= ``non_bg_threshold``. Levels
    smaller than one tile are skipped, as the reference does.

    Defaults are the DigestPath step-1 hyperparameters, so collecting this
    iterator reproduces the offline harvest tile-for-tile (tested in
    tests/test_wsi.py)."""
    from PIL import Image

    if isinstance(image, str):
        base = Image.open(image).convert("RGB")
    elif hasattr(image, "convert"):
        base = image.convert("RGB")
    else:
        base = Image.fromarray(np.asarray(image))

    for downsample in downsample_list:
        new_size = (
            int(np.round(base.size[0] / downsample)),
            int(np.round(base.size[1] / downsample)),
        )
        if new_size[0] < tile or new_size[1] < tile:
            continue
        arr = np.array(base.resize(new_size))
        stride = tile * (1 - overlap)
        x_list = np.arange(0, arr.shape[0], stride).astype(int)
        y_list = np.arange(0, arr.shape[1], stride).astype(int)
        for x1 in x_list:
            for y1 in y_list:
                x2, y2 = x1 + tile, y1 + tile
                if x2 >= arr.shape[0] or y2 >= arr.shape[1]:
                    continue
                patch = arr[x1:x2, y1:y2, :]
                tissue = 1.0 - background_ratio(patch, bg_pixel_threshold)
                if tissue < non_bg_threshold:
                    continue
                yield patch, (downsample, x1, y1)


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
    tiles = iter_wsi_tiles(image, tile, overlap, downsample, non_bg_threshold)
    return _embed_tile_stream(model, tiles, batch_size, tile, mesh, normalize,
                              coord_len=2)


def embed_wsi_pyramid(
    model,
    image,
    downsample_list=(2, 4, 8, 16, 32),
    batch_size: int = 256,
    tile: int = 224,
    overlap: float = 0.1,
    non_bg_threshold: float = 0.5,
    mesh=None,
    normalize: bool = True,
):
    """Stream the WHOLE multi-downsample sweep through the image tower in one
    pass (VERDICT r1 #7): one decode, all pyramid levels, one device pipeline
    — the streaming analog of the reference's offline
    ``preprocess_DigestPath.py --step 1`` harvest.

    Returns (embeddings [N, embed_dim] float32, coords [N, 3] int —
    (downsample, y, x) per tile). Batches may span level boundaries, so the
    MXU never drains between levels."""
    tiles = iter_wsi_pyramid(image, downsample_list, tile, overlap,
                             non_bg_threshold)
    return _embed_tile_stream(model, tiles, batch_size, tile, mesh, normalize,
                              coord_len=3)


def _embed_tile_stream(model, tiles, batch_size, tile, mesh, normalize,
                       coord_len):
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

    for patch, yx in tiles:
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
        return np.zeros((0, dim), np.float32), np.zeros((0, coord_len), np.int64)
    out = np.concatenate(embs, axis=0)
    if normalize:
        out = out / np.linalg.norm(out, axis=1, keepdims=True)
    return out, np.asarray(coords, np.int64)
