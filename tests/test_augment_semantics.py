"""Behavioral verification of the device-side augmentation warp: each
composed transform does what the reference's torchvision stage does."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plip_tpu.ops.augment import (
    AugmentConfig,
    _affine_forward_matrix,
    augment_batch,
    warp_normalize,
)


def _denorm(out, cfg):
    mean = np.asarray(cfg.mean) * 255
    std = np.asarray(cfg.std) * 255
    return np.asarray(out) * std + mean


def _dot_image(size=64, y=20, x=40):
    img = np.zeros((1, size, size, 3), np.uint8)
    img[0, y - 1 : y + 2, x - 1 : x + 2] = 255
    return img


def _identity_M(batch=1):
    return jnp.broadcast_to(jnp.eye(3), (batch, 3, 3))


def test_hflip_mirrors():
    cfg = AugmentConfig(out_size=64)
    img = _dot_image(64, y=20, x=40)
    out = warp_normalize(
        jnp.asarray(img), _identity_M(), jnp.zeros((1, 2), jnp.int32),
        jnp.asarray([True]), cfg,
    )
    res = _denorm(out, cfg)[0, :, :, 0]
    yy, xx = np.unravel_index(np.argmax(res), res.shape)
    assert abs(yy - 20) <= 1
    assert abs(xx - (63 - 40)) <= 1  # mirrored about the vertical axis


def test_crop_offset_shifts_window():
    cfg = AugmentConfig(out_size=32)
    img = _dot_image(64, y=40, x=44)
    # crop window starting at (top=24, left=28): dot should appear at (16, 16)
    out = warp_normalize(
        jnp.asarray(img), _identity_M(), jnp.asarray([[24, 28]], jnp.int32),
        jnp.asarray([False]), cfg,
    )
    res = _denorm(out, cfg)[0, :, :, 0]
    yy, xx = np.unravel_index(np.argmax(res), res.shape)
    assert abs(yy - 16) <= 1 and abs(xx - 16) <= 1


def test_translate_moves_content():
    cfg = AugmentConfig(out_size=64)
    img = _dot_image(64, y=32, x=32)
    # forward translate (+8, +4): output content moves by (+8 x, +4 y)
    M_fwd = _affine_forward_matrix(
        jnp.zeros((1,)), jnp.asarray([[8.0, 4.0]]), jnp.ones((1,)),
        jnp.zeros((1,)), jnp.zeros((1,)), (31.5, 31.5),
    )
    M = jnp.linalg.inv(M_fwd)
    out = warp_normalize(
        jnp.asarray(img), M, jnp.zeros((1, 2), jnp.int32),
        jnp.asarray([False]), cfg,
    )
    res = _denorm(out, cfg)[0, :, :, 0]
    yy, xx = np.unravel_index(np.argmax(res), res.shape)
    assert abs(xx - 40) <= 1 and abs(yy - 36) <= 1


def test_rotation_90deg_moves_dot():
    cfg = AugmentConfig(out_size=64)
    img = _dot_image(64, y=16, x=32)  # dot above center
    import math

    M_fwd = _affine_forward_matrix(
        jnp.asarray([math.pi / 2]), jnp.zeros((1, 2)), jnp.ones((1,)),
        jnp.zeros((1,)), jnp.zeros((1,)), (31.5, 31.5),
    )
    M = jnp.linalg.inv(M_fwd)
    out = warp_normalize(
        jnp.asarray(img), M, jnp.zeros((1, 2), jnp.int32),
        jnp.asarray([False]), cfg,
    )
    res = _denorm(out, cfg)[0, :, :, 0]
    yy, xx = np.unravel_index(np.argmax(res), res.shape)
    # rotating the sampling grid by +90° maps a dot above center onto a
    # horizontal neighbor of center; verify it moved off the vertical axis
    assert abs(yy - 31.5) <= 2.5
    assert abs(xx - 31.5) > 10


def test_fill_applied_outside_crop():
    cfg = AugmentConfig(out_size=64, fill=127.0)
    img = jnp.asarray(np.full((1, 64, 64, 3), 255, np.uint8))
    import math

    # large translation pushes most of the crop outside -> fill dominates
    M_fwd = _affine_forward_matrix(
        jnp.zeros((1,)), jnp.asarray([[200.0, 0.0]]), jnp.ones((1,)),
        jnp.zeros((1,)), jnp.zeros((1,)), (31.5, 31.5),
    )
    M = jnp.linalg.inv(M_fwd)
    out = warp_normalize(img, M, jnp.zeros((1, 2), jnp.int32),
                         jnp.asarray([False]), cfg)
    res = _denorm(out, cfg)
    assert np.isclose(res, 127.0, atol=1.0).mean() > 0.9


def test_flip_probability_distribution():
    """With hflip_prob=0.5, roughly half the batch flips (asymmetric image)."""
    cfg = AugmentConfig(
        out_size=32, hflip_prob=0.5, degrees=0.0, translate=(0.0, 0.0),
        scale_range=(1.0, 1.0), shear=(0.0, 0.0), perspective_prob=0.0,
    )
    img = np.zeros((256, 32, 32, 3), np.uint8)
    img[:, :, :16] = 200  # left half bright
    out = _denorm(augment_batch(jax.random.PRNGKey(0), jnp.asarray(img), cfg), cfg)
    left_bright = out[:, :, :16, 0].mean(axis=(1, 2)) > 100
    frac = left_bright.mean()
    assert 0.35 < frac < 0.65, frac
