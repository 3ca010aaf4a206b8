"""Single-kernel Pallas formulation of resize→crop→rescale→normalize.

The default preprocessing path (ops/preprocess.py) evaluates the same math as
two XLA einsums with fused epilogues and measures 413k img/s on v5e — already
~36× faster than the encoder it feeds, so this kernel exists as the fully
fused alternative (one ``pallas_call``, both resample passes + PIL uint8
quantization + normalize without any HBM intermediate) and as the template
for fusing further stages (e.g. patchify) into it later.

Layout: the kernel works channel-planar (grid (B, C), block [H, W]); the
NHWC↔planar transposes on either side are XLA reshapes over uint8 data —
negligible next to the resample matmuls.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD
from .resize import resize_crop_matrices

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False


def _kernel(x_ref, row_ref, col_ref, mean_ref, std_ref, o_ref, *, emulate_uint8):
    c = pl.program_id(1)
    # input arrives as int8 holding (u8 - 128): Mosaic lacks a u8->f32 cast
    x = x_ref[0, 0].astype(jnp.float32) + 128.0  # [H, W] in 0..255
    R = row_ref[:]  # [out, H]
    C = col_ref[:]  # [out, W]

    def quant(v):
        if not emulate_uint8:
            return v
        return jnp.clip(jnp.floor(v + 0.5), 0.0, 255.0)

    # horizontal (width) pass first, as PIL does: x @ C.T -> [H, out]
    t = jax.lax.dot_general(
        x, C, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    t = quant(t)
    # vertical pass: R @ t -> [out, out]
    y = jnp.dot(R, t, preferred_element_type=jnp.float32)
    y = quant(y)
    mean = mean_ref[c, 0]
    std = std_ref[c, 0]
    o_ref[0, 0] = (y - mean) / std


def preprocess_batch_pallas(
    images,  # [B, H, W, 3] uint8/float
    out_size: int = 224,
    mean: Tuple[float, float, float] = CLIP_IMAGE_MEAN,
    std: Tuple[float, float, float] = CLIP_IMAGE_STD,
    emulate_uint8: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused-kernel equivalent of ops.preprocess.preprocess_batch."""
    if not _HAS_PALLAS:
        raise RuntimeError("pallas unavailable")
    images = jnp.asarray(images)
    if images.ndim == 3:
        images = images[None]
    B, H, W, Cc = images.shape
    R, C = resize_crop_matrices(H, W, out_size, out_size)
    # shift-encode uint8 as int8 (u8 - 128); undone inside the kernel
    shifted = (images.astype(jnp.int32) - 128).astype(jnp.int8)
    planar = shifted.transpose(0, 3, 1, 2)  # [B, 3, H, W]
    mean_arr = jnp.asarray(np.asarray(mean, np.float32) * 255.0).reshape(3, 1)
    std_arr = jnp.asarray(np.asarray(std, np.float32) * 255.0).reshape(3, 1)

    out = pl.pallas_call(
        functools.partial(_kernel, emulate_uint8=emulate_uint8),
        grid=(B, Cc),
        in_specs=[
            pl.BlockSpec((1, 1, H, W), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_size, H), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_size, W), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, out_size, out_size),
                               lambda b, c: (b, c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Cc, out_size, out_size), jnp.float32),
        interpret=interpret,
    )(planar, jnp.asarray(R), jnp.asarray(C), mean_arr, std_arr)
    return out.transpose(0, 2, 3, 1)  # back to NHWC
