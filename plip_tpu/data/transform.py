"""Transform factories mirroring
`/root/reference/reproducibility/embedders/transform.py:14-52`.

- ``eval_transform(n_px)``: host-callable item transform producing decoded
  uint8 (the actual resize→crop→normalize runs batched on device via
  ``ops.preprocess``; keeping items as raw uint8 lets the loader ship compact
  bytes and the TPU do the math).
- ``train_transform(first_resize, n_px)``: host side resizes shortest-side to
  ``first_resize`` and square-crops it (static shapes for batching); the
  RandomCrop/HFlip/Affine/Perspective/normalize stack runs on device as one
  batched homography warp (``ops.augment``).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np

from ..ops.augment import AugmentConfig
from ..ops.resize import torchvision_resized_dims


def eval_transform(n_px: int = 224) -> Callable:
    """Item transform: raw uint8 HWC out (device does the rest)."""

    def fn(img_u8: np.ndarray) -> np.ndarray:
        return img_u8

    fn.n_px = n_px
    return fn


@dataclasses.dataclass
class TrainTransform:
    """Host half of the train pipeline: shortest-side resize to
    ``first_resize`` + random square crop of the long dim (cheap slice), so
    batches stack statically. Device half = ops.augment.augment_batch.

    Crop randomness is STATELESS per item: each call derives its generator
    from ``(seed, epoch, index)``. A shared stateful generator raced across
    the loader's decode threads (np.random.Generator is not thread-safe and
    the draw→image mapping depended on scheduling), which made training
    pixels — and hence loss trajectories — nondeterministic run to run.
    Bump ``epoch`` between epochs for fresh crops (CLIPTuner does).
    """

    first_resize: int = 512
    n_px: int = 224
    seed: int = 0
    epoch: int = 0

    def __post_init__(self):
        self.aug = AugmentConfig(out_size=self.n_px)

    def __call__(self, img_u8: np.ndarray, index: int = 0) -> np.ndarray:
        from PIL import Image

        h, w = img_u8.shape[:2]
        rh, rw = torchvision_resized_dims(h, w, self.first_resize)
        if (rh, rw) != (h, w):
            img_u8 = np.asarray(
                Image.fromarray(img_u8).resize((rw, rh), Image.BICUBIC)
            )
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, self.epoch, index])
        )
        # random square crop of the long dimension -> [first, first, 3]
        if rh > self.first_resize:
            top = int(rng.integers(0, rh - self.first_resize + 1))
            img_u8 = img_u8[top : top + self.first_resize]
        if rw > self.first_resize:
            left = int(rng.integers(0, rw - self.first_resize + 1))
            img_u8 = img_u8[:, left : left + self.first_resize]
        return np.ascontiguousarray(img_u8)


# Reference-compatible names
def _transform(n_px: int = 224):
    return eval_transform(n_px)


def _train_transform(first_resize: int = 512, n_px: int = 224):
    return TrainTransform(first_resize=first_resize, n_px=n_px)
