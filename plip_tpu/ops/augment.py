"""Device-side batched training augmentation.

The reference's train transform (`/root/reference/reproducibility/embedders/
transform.py:18-42`) is a host-bound per-image torchvision stack:
RandomCrop(224) → HFlip → RandomAffine(±10°, translate .1, scale .8–1.2,
shear ±15, bilinear, fill 127) → RandomPerspective(.3, p=.3, fill 127) →
normalize. Every one of those stages is a projective map — so the TPU-native
version composes them into ONE 3×3 homography per image and applies a single
batched bilinear warp (4 gathers + lerp on the VPU), then fuses the
normalize. Host work drops to JPEG decode + a static resize; the augmentation
itself runs on device, batched, under jit.

Sampling distributions match the reference parameters; exact per-pixel parity
with torchvision is not a goal (stochastic transform), single-resampling is
(one interpolation instead of three = strictly less blur).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from ..models.config import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    out_size: int = 224
    hflip_prob: float = 0.5
    degrees: float = 10.0
    translate: Tuple[float, float] = (0.1, 0.1)
    scale_range: Tuple[float, float] = (0.8, 1.2)
    shear: Tuple[float, float] = (15.0, 15.0)  # (±x°, ±y°)
    perspective_scale: float = 0.3
    perspective_prob: float = 0.3
    fill: float = 127.0
    mean: Tuple[float, float, float] = CLIP_IMAGE_MEAN
    std: Tuple[float, float, float] = CLIP_IMAGE_STD


def _affine_forward_matrix(angle, translate, scale, shear_x, shear_y, center):
    """Forward affine map: T(translate) · C · R(angle)·S(scale)·Shear · C⁻¹.

    Same composition torchvision uses for RandomAffine (angles in radians).
    Returns [..., 3, 3].
    """
    cos_a, sin_a = jnp.cos(angle), jnp.sin(angle)
    tan_sx, tan_sy = jnp.tan(shear_x), jnp.tan(shear_y)
    # R·Shear (torchvision convention: rotation then shear combined as RSS)
    a = cos_a - sin_a * tan_sy
    b = cos_a * tan_sx - sin_a * (1 + tan_sx * tan_sy)
    c = sin_a + cos_a * tan_sy
    d = sin_a * tan_sx + cos_a * (1 + tan_sx * tan_sy)
    zeros = jnp.zeros_like(angle)
    ones = jnp.ones_like(angle)
    rss = jnp.stack(
        [
            jnp.stack([scale * a, scale * b, zeros], -1),
            jnp.stack([scale * c, scale * d, zeros], -1),
            jnp.stack([zeros, zeros, ones], -1),
        ],
        -2,
    )
    cx, cy = center
    tx, ty = translate[..., 0], translate[..., 1]

    def _t(tx_, ty_):
        return jnp.stack(
            [
                jnp.stack([ones, zeros, tx_], -1),
                jnp.stack([zeros, ones, ty_], -1),
                jnp.stack([zeros, zeros, ones], -1),
            ],
            -2,
        )

    c_plus = _t(jnp.full_like(angle, cx), jnp.full_like(angle, cy))
    c_minus = _t(jnp.full_like(angle, -cx), jnp.full_like(angle, -cy))
    t_mat = _t(tx, ty)
    return t_mat @ c_plus @ rss @ c_minus


def _perspective_matrix(key, batch: int, size: int, distortion: float, prob: float):
    """Random projective matrix à la torchvision RandomPerspective.

    Corner points move inward by U[0, distortion·half]; we solve the 8-DOF
    homography mapping the distorted corners to the originals (the dst→src
    direction used for sampling), batched via linalg.solve.
    """
    k1, k2 = jax.random.split(key)
    half = size / 2.0
    # displacement of each corner, shape [B, 4, 2]
    disp = jax.random.uniform(k1, (batch, 4, 2)) * distortion * half
    corners = jnp.asarray(
        [[0.0, 0.0], [size - 1.0, 0.0], [size - 1.0, size - 1.0], [0.0, size - 1.0]]
    )
    signs = jnp.asarray([[1, 1], [-1, 1], [-1, -1], [1, -1]], jnp.float32)
    end = corners[None] + signs[None] * disp  # distorted (output) corners

    # Solve H such that H @ [end, 1] ~ [corners, 1]  (dst -> src)
    def solve_one(e, s):
        rows = []
        for i in range(4):
            ex, ey = e[i, 0], e[i, 1]
            sx, sy = s[i, 0], s[i, 1]
            rows.append(jnp.stack([ex, ey, 1.0, 0.0, 0.0, 0.0, -sx * ex, -sx * ey]))
            rows.append(jnp.stack([0.0, 0.0, 0.0, ex, ey, 1.0, -sy * ex, -sy * ey]))
        A = jnp.stack(rows)
        b = s.reshape(-1)
        h = jnp.linalg.solve(A, b)
        return jnp.concatenate([h, jnp.ones((1,))]).reshape(3, 3)

    H = jax.vmap(solve_one, in_axes=(0, None))(end, corners)
    apply = jax.random.uniform(k2, (batch,)) < prob
    eye = jnp.broadcast_to(jnp.eye(3), H.shape)
    return jnp.where(apply[:, None, None], H, eye)


def sample_warp(
    key, batch: int, in_size: int, cfg: AugmentConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample per-image composed dst→crop-space matrices and crop offsets.

    Returns (M [B,3,3] mapping output px -> crop coords, offsets [B,2] crop
    top-left in the in_size image, flip [B] bools).
    """
    ks = jax.random.split(key, 7)
    out = cfg.out_size
    max_off = in_size - out
    offsets = jax.random.randint(ks[0], (batch, 2), 0, max_off + 1)  # (top, left)
    flip = jax.random.uniform(ks[1], (batch,)) < cfg.hflip_prob

    deg = jax.random.uniform(ks[2], (batch,), minval=-cfg.degrees, maxval=cfg.degrees)
    angle = deg * math.pi / 180.0
    tmax = jnp.asarray(cfg.translate) * out
    translate = jax.random.uniform(ks[3], (batch, 2), minval=-tmax, maxval=tmax)
    scale = jax.random.uniform(
        ks[4], (batch,), minval=cfg.scale_range[0], maxval=cfg.scale_range[1]
    )
    shear_x = (
        jax.random.uniform(ks[5], (batch,), minval=-cfg.shear[0], maxval=cfg.shear[0])
        * math.pi
        / 180.0
    )
    shear_y = (
        jax.random.uniform(ks[6], (batch,), minval=-cfg.shear[1], maxval=cfg.shear[1])
        * math.pi
        / 180.0
    )
    center = ((out - 1) / 2.0, (out - 1) / 2.0)
    fwd = _affine_forward_matrix(angle, translate, scale, shear_x, shear_y, center)
    inv_affine = jnp.linalg.inv(fwd)

    persp = _perspective_matrix(
        jax.random.fold_in(key, 99), batch, out, cfg.perspective_scale, cfg.perspective_prob
    )
    # output px --(persp dst->src)--> affine-output coords --(inv affine)--> crop coords
    M = inv_affine @ persp
    return M, offsets, flip


def warp_normalize(
    images: jnp.ndarray,  # [B, S, S, 3] uint8/float, S = in_size
    M: jnp.ndarray,  # [B, 3, 3] output-px -> crop-space
    offsets: jnp.ndarray,  # [B, 2] (top, left)
    flip: jnp.ndarray,  # [B] bool
    cfg: AugmentConfig,
) -> jnp.ndarray:
    B, S, _, C = images.shape
    out = cfg.out_size
    x = images.astype(jnp.float32)

    # output grid, homogeneous
    ii = jax.lax.broadcasted_iota(jnp.float32, (out, out), 0)  # y
    jj = jax.lax.broadcasted_iota(jnp.float32, (out, out), 1)  # x
    grid = jnp.stack([jj.ravel(), ii.ravel(), jnp.ones(out * out)], axis=0)  # [3, P]

    src = M @ grid  # [B, 3, P]
    u = src[:, 0] / src[:, 2]  # crop-space x
    v = src[:, 1] / src[:, 2]  # crop-space y

    # fill where the warp exits the virtual 224 crop (torchvision fill=127)
    inside = (u >= -0.5) & (u <= out - 0.5) & (v >= -0.5) & (v <= out - 0.5)

    # flip inside crop space, then place the crop into the in_size image
    u = jnp.where(flip[:, None], (out - 1.0) - u, u)
    u = u + offsets[:, 1:2].astype(jnp.float32)
    v = v + offsets[:, 0:1].astype(jnp.float32)

    u = jnp.clip(u, 0.0, S - 1.0)
    v = jnp.clip(v, 0.0, S - 1.0)
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0
    u0 = u0.astype(jnp.int32)
    v0 = v0.astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, S - 1)
    v1 = jnp.minimum(v0 + 1, S - 1)

    bidx = jax.lax.broadcasted_iota(jnp.int32, u0.shape, 0)

    def gather(yy, xx):
        return x[bidx, yy, xx]  # [B, P, C]

    top = gather(v0, u0) * (1 - du)[..., None] + gather(v0, u1) * du[..., None]
    bot = gather(v1, u0) * (1 - du)[..., None] + gather(v1, u1) * du[..., None]
    val = top * (1 - dv)[..., None] + bot * dv[..., None]

    val = jnp.where(inside[..., None], val, cfg.fill)
    mean = jnp.asarray(cfg.mean, jnp.float32) * 255.0
    std = jnp.asarray(cfg.std, jnp.float32) * 255.0
    val = (val - mean) / std
    return val.reshape(B, out, out, C)


def augment_batch(
    key, images: jnp.ndarray, cfg: AugmentConfig = AugmentConfig()
) -> jnp.ndarray:
    """[B, S, S, 3] uint8 -> [B, out, out, 3] float32 normalized, augmented."""
    B, S = images.shape[0], images.shape[1]
    M, offsets, flip = sample_warp(key, B, S, cfg)
    return warp_normalize(images, M, offsets, flip, cfg)
