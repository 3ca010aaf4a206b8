"""PLIP_TPU_INTERPRET=1 end-to-end: the REAL fused-kernel dispatch path
(model-level `_use_pallas()` gates, flat-token scan, custom-VJP Pallas
backwards) runs on CPU in Pallas interpret mode and matches the composed
XLA path — loss and every gradient leaf. This covers the dispatch glue the
kernel-level interpret tests can't reach (tower flattening, block pickers,
remat interplay)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig, TextConfig, VisionConfig
from plip_tpu.train.contrastive import clip_loss


def _tiny():
    cfg = CLIPConfig(
        vision=VisionConfig(width=32, layers=2, heads=2, image_size=32,
                            patch_size=16),
        text=TextConfig(width=32, layers=2, heads=2, vocab_size=128,
                        context_length=16),
        embed_dim=16,
    )
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal((8, 32, 32, 3)).astype(np.float32))
    ids = np.zeros((8, 16), np.int32)
    ids[:, 0] = 1
    ids[:, 1] = rng.integers(2, 120, 8)
    ids[:, 2] = cfg.text.eot
    return cfg, params, px, jnp.asarray(ids)


def test_interpret_mode_matches_composed(monkeypatch):
    cfg, params, px, ids = _tiny()

    def loss_grads():
        # fresh closure per mode: no jit cache reuse across env flips
        def f(p):
            return clip_loss(p, px, ids, cfg, jnp.float32)[0]

        return jax.value_and_grad(f)(params)

    from plip_tpu.ops import attention as A

    monkeypatch.delenv("PLIP_TPU_INTERPRET", raising=False)
    assert not A._use_pallas()  # CPU: composed path
    loss_c, grads_c = loss_grads()

    monkeypatch.setenv("PLIP_TPU_INTERPRET", "1")
    assert A._use_pallas()  # kernels now live (interpret)
    loss_k, grads_k = loss_grads()

    np.testing.assert_allclose(float(loss_k), float(loss_c),
                               rtol=2e-5, atol=2e-5)
    for (path_c, leaf_c), (path_k, leaf_k) in zip(
        jax.tree_util.tree_leaves_with_path(grads_c),
        jax.tree_util.tree_leaves_with_path(grads_k),
    ):
        assert path_c == path_k
        np.testing.assert_allclose(
            np.asarray(leaf_k), np.asarray(leaf_c), rtol=5e-5, atol=5e-5,
            err_msg=jax.tree_util.keystr(path_c))


def test_interpret_mode_encode(monkeypatch):
    """Forward-only encode through the fused path equals composed."""
    cfg, params, px, ids = _tiny()
    monkeypatch.delenv("PLIP_TPU_INTERPRET", raising=False)
    img_c = jclip.encode_image(params, px, cfg, jnp.float32)
    txt_c = jclip.encode_text(params, ids, cfg, jnp.float32)
    monkeypatch.setenv("PLIP_TPU_INTERPRET", "1")
    img_k = jclip.encode_image(params, px, cfg, jnp.float32)
    txt_k = jclip.encode_text(params, ids, cfg, jnp.float32)
    np.testing.assert_allclose(np.asarray(img_k), np.asarray(img_c),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(txt_k), np.asarray(txt_c),
                               rtol=2e-5, atol=2e-5)
