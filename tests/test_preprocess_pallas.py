"""Pallas fused preprocess kernel: interpret-mode parity vs the XLA path."""

import numpy as np
import pytest

from plip_tpu.ops.preprocess import preprocess_batch
from plip_tpu.ops.preprocess_pallas import preprocess_batch_pallas


@pytest.mark.parametrize("shape", [(256, 256), (300, 400), (224, 224)])
def test_parity_vs_xla_path(shape):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (2, *shape, 3), dtype=np.uint8)
    ref = np.asarray(preprocess_batch(arr))
    out = np.asarray(preprocess_batch_pallas(arr, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_no_quant_mode():
    import jax.numpy as jnp

    from plip_tpu.ops.preprocess import _preprocess_same_shape
    from plip_tpu.ops.resize import resize_crop_matrices

    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, (1, 256, 256, 3), dtype=np.uint8)
    R, C = resize_crop_matrices(256, 256, 224, 224)
    ref = np.asarray(
        _preprocess_same_shape(
            jnp.asarray(arr), jnp.asarray(R), jnp.asarray(C), emulate_uint8=False
        )
    )
    raw = np.asarray(
        preprocess_batch_pallas(arr, emulate_uint8=False, interpret=True)
    )
    np.testing.assert_allclose(raw, ref, atol=1e-4)


def test_flag_through_preprocess_batch():
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 256, (2, 256, 256, 3), dtype=np.uint8)
    # on CPU the pallas path requires interpret; assert it raises cleanly or
    # matches when pallas lowering is available via interpret fallback
    try:
        out = np.asarray(preprocess_batch(arr, use_pallas=True))
    except Exception:
        pytest.skip("pallas compiled mode unavailable on CPU")
    ref = np.asarray(preprocess_batch(arr))
    np.testing.assert_allclose(out, ref, atol=1e-5)
