"""Dataset wrappers — torch-free rebuilds of
`/root/reference/reproducibility/embedders/internal_datasets.py:6-58`.

Same four shapes (image+caption, caption-only, image-only, image+label), same
PIL robustness settings (tolerate truncated files, unbounded pixel count —
internal_datasets.py:3-4), but framework-native: plain indexable objects whose
items are host numpy, consumed by the prefetching loader in data/loader.py
instead of a torch DataLoader.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np

try:
    from PIL import Image, ImageFile

    ImageFile.LOAD_TRUNCATED_IMAGES = True
    Image.MAX_IMAGE_PIXELS = None
    _HAS_PIL = True
except ImportError:  # pragma: no cover
    _HAS_PIL = False


def load_image_rgb(path_or_img) -> np.ndarray:
    """Path/PIL/array -> HWC uint8 RGB numpy.

    JPEG paths go through the native libjpeg pool (plip_tpu.native) when it's
    built — bit-identical to PIL's decode, no Image-object overhead, GIL-free
    under the threaded loader; anything else (or on failure) falls back to PIL.
    """
    if isinstance(path_or_img, np.ndarray):
        arr = path_or_img
    elif hasattr(path_or_img, "convert"):
        arr = np.asarray(path_or_img.convert("RGB"))
    else:
        arr = None
        if str(path_or_img).lower().endswith((".jpg", ".jpeg")):
            from .. import native

            if native.available():
                arr = native.decode_jpeg(str(path_or_img))
        if arr is None:
            if not _HAS_PIL:
                raise RuntimeError("PIL required to open image paths")
            arr = np.asarray(Image.open(path_or_img).convert("RGB"))
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    return arr.astype(np.uint8)


def _accepts_index(preprocessing) -> bool:
    """True when ``preprocessing(img, index=i)`` is supported — lets
    per-item-seeded transforms (data.transform.TrainTransform) get a
    deterministic stream regardless of decode-thread scheduling."""
    if preprocessing is None:
        return False
    import inspect

    try:
        return "index" in inspect.signature(preprocessing).parameters
    except (TypeError, ValueError):
        return False


class ImageCaptionDataset:
    """df columns: image, caption (internal_datasets.py:6-18)."""

    def __init__(self, df, preprocessing: Optional[Callable] = None):
        self.images: List = list(df["image"])
        self.captions: List = list(df["caption"])
        self.preprocessing = preprocessing
        self._wants_index = _accepts_index(preprocessing)

    def __len__(self):
        return len(self.captions)

    def __getitem__(self, idx):
        img = load_image_rgb(self.images[idx])
        if self.preprocessing is not None:
            img = (self.preprocessing(img, index=idx)
                   if self._wants_index else self.preprocessing(img))
        return img, self.captions[idx]


class CaptionDataset:
    """Caption-only (internal_datasets.py:21-30)."""

    def __init__(self, captions: Sequence[str]):
        self.captions = list(captions)

    def __len__(self):
        return len(self.captions)

    def __getitem__(self, idx):
        return self.captions[idx]


class ImageDataset:
    """Image-only (internal_datasets.py:33-43).

    on_error: "raise" (default) propagates decode failures through the loader;
    "zero" substitutes a zero tile (order and static shapes preserved) and
    records the index in ``failed_indices`` — the streaming-bulk analog of the
    reference's skip-unopenable-at-datagen tolerance (_dataset_loader.py:69-73).
    """

    def __init__(
        self,
        list_of_images: Sequence,
        preprocessing: Optional[Callable] = None,
        on_error: str = "raise",
        zero_shape=(224, 224, 3),
    ):
        self.images = list(list_of_images)
        self.preprocessing = preprocessing
        self.on_error = on_error
        self.zero_shape = zero_shape
        self.failed_indices: List[int] = []
        self._wants_index = _accepts_index(preprocessing)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx):
        try:
            img = load_image_rgb(self.images[idx])
        except Exception:
            if self.on_error != "zero":
                raise
            self.failed_indices.append(idx)
            img = np.zeros(self.zero_shape, np.uint8)
        if self.preprocessing is not None:
            img = (self.preprocessing(img, index=idx)
                   if self._wants_index else self.preprocessing(img))
        return img


class ImageLabelDataset:
    """df columns: image, label (internal_datasets.py:46-58)."""

    def __init__(self, df, preprocessing: Optional[Callable] = None):
        self.images: List = list(df["image"])
        self.labels: List = list(df["label"])
        self.preprocessing = preprocessing
        self._wants_index = _accepts_index(preprocessing)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx):
        img = load_image_rgb(self.images[idx])
        if self.preprocessing is not None:
            img = (self.preprocessing(img, index=idx)
                   if self._wants_index else self.preprocessing(img))
        return img, self.labels[idx]


# Reference-compatible aliases
CLIPImageCaptioningDataset = ImageCaptionDataset
CLIPCaptioningDataset = CaptionDataset
CLIPImageDataset = ImageDataset
CLIPImageLabelDataset = ImageLabelDataset
