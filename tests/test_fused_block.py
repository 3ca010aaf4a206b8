"""Fused whole-block Pallas kernel: parity vs the composed block path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plip_tpu.models.layers import block, init_block_stack
from plip_tpu.ops.block import _jnp_block, _pallas_block, transformer_block


def _params(width, key=0):
    return jax.tree.map(
        lambda a: a[0], init_block_stack(jax.random.PRNGKey(key), 1, width)
    )


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("bs", [(3, 10, 64, 4), (2, 16, 128, 2)])
def test_block_kernel_interpret_matches_composed(bs, causal):
    B, S, W, H = bs
    p = _params(W)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, S, W)).astype(np.float32))
    ref = _jnp_block(x, p, H, causal, 1e-5)
    out = _pallas_block(x, p, H, causal, 1e-5, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-5,
                               atol=3e-5)


def test_block_kernel_matches_layers_block():
    """The composed fallback must equal models.layers.block exactly (same
    functions), so the fused kernel is drop-in for the scan body."""
    p = _params(64, key=3)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 64)).astype(np.float32))
    a = transformer_block(x, p, 4, False)
    b = block(x, p, 4, False, fused_sublayer=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


def test_block_kernel_gradients():
    p = _params(32, key=5)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 8, 32)).astype(np.float32))

    g1 = jax.grad(lambda a, b: jnp.sum(transformer_block(a, b, 4, True) ** 2),
                  argnums=(0, 1))(x, p)
    g2 = jax.grad(lambda a, b: jnp.sum(_jnp_block(a, b, 4, True, 1e-5) ** 2),
                  argnums=(0, 1))(x, p)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)
