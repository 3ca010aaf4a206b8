"""Fused MLP-half backward kernel: interpret-mode parity vs jax.vjp of the
composed path, and the flat-transformer wiring under remat='mlp'."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plip_tpu.models.layers import init_block_stack


def _blk(key, W):
    return jax.tree.map(lambda a: a[0], init_block_stack(key, 1, W))


@pytest.mark.parametrize("shape,S", [((120, 64), 10), ((200, 96), 50),
                                     ((64, 32), 8)])
def test_mlp_bwd_kernel_matches_vjp(shape, S):
    from plip_tpu.ops.mlp import (_jnp_mlp_sublayer_flat,
                                  _pallas_mlp_bwd_flat)

    N, W = shape
    rng = np.random.default_rng(5)
    blk = _blk(jax.random.PRNGKey(2), W)
    x = jnp.asarray(rng.standard_normal((N, W)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((N, W)).astype(np.float32))
    _, vjp = jax.vjp(
        lambda a, l, m: _jnp_mlp_sublayer_flat(a, l, m, 1e-5),
        x, blk["ln2"], blk["mlp"],
    )
    ref = vjp(g)
    out = _pallas_mlp_bwd_flat(x, g, blk["ln2"], blk["mlp"], 1e-5, S=S,
                               interpret=True)
    for a, b in zip(jax.tree.leaves(out), jax.tree.leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=5e-4)


def test_mlp_bwd_kernel_bf16():
    from plip_tpu.ops.mlp import (_jnp_mlp_sublayer_flat,
                                  _pallas_mlp_bwd_flat)

    rng = np.random.default_rng(6)
    blk = _blk(jax.random.PRNGKey(3), 64)
    x = jnp.asarray(rng.standard_normal((80, 64)), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((80, 64)), jnp.bfloat16)
    _, vjp = jax.vjp(
        lambda a, l, m: _jnp_mlp_sublayer_flat(a, l, m, 1e-5),
        x, blk["ln2"], blk["mlp"],
    )
    ref = vjp(g)
    out = _pallas_mlp_bwd_flat(x, g, blk["ln2"], blk["mlp"], 1e-5, S=10,
                               interpret=True)
    for a, b in zip(jax.tree.leaves(out), jax.tree.leaves(ref)):
        a = np.asarray(a, np.float32).ravel()
        b = np.asarray(b, np.float32).ravel()
        cos = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > 0.999


def test_mlp_sublayer_flat_custom_vjp_grads(monkeypatch):
    """Grads through mlp_sublayer_flat with the Pallas backward (interpret)
    must match jax.grad of the composed path. (The op is parity-tested but
    deliberately NOT wired into the tower — measured slower in-model, see
    ops/mlp.py docstring.)"""
    from plip_tpu.ops import mlp as MK

    rng = np.random.default_rng(7)
    blk = _blk(jax.random.PRNGKey(9), 64)
    x = jnp.asarray(rng.standard_normal((40, 64)).astype(np.float32))

    def ref_loss(x, l, m):
        return jnp.sum(MK._jnp_mlp_sublayer_flat(x, l, m, 1e-5) ** 2)

    ref = jax.grad(ref_loss, argnums=(0, 1, 2))(x, blk["ln2"], blk["mlp"])

    monkeypatch.setattr(MK, "_mlp_pallas_ok", lambda *a: True)
    monkeypatch.setattr(
        MK, "_pallas_mlp_bwd_flat",
        functools.partial(MK._pallas_mlp_bwd_flat, interpret=True))

    def loss(x, l, m):
        return jnp.sum(MK.mlp_sublayer_flat(x, l, m, 10) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(x, blk["ln2"], blk["mlp"])
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-3)


def test_mlp_kernel_fwd_is_composed():
    """The custom-vjp forward must be the plain composed math (no kernel)."""
    from plip_tpu.ops.mlp import _jnp_mlp_sublayer_flat, mlp_sublayer_flat

    rng = np.random.default_rng(8)
    blk = _blk(jax.random.PRNGKey(4), 32)
    x = jnp.asarray(rng.standard_normal((40, 32)).astype(np.float32))
    out = mlp_sublayer_flat(x, blk["ln2"], blk["mlp"], 10)
    ref = _jnp_mlp_sublayer_flat(x, blk["ln2"], blk["mlp"], 1e-5)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("shape,S", [((120, 64), 10), ((64, 32), 8)])
def test_mlp_fwd_kernel_matches_composed(shape, S):
    from plip_tpu.ops.mlp import (_jnp_mlp_sublayer_flat,
                                  _pallas_mlp_fwd_flat)

    N, W = shape
    rng = np.random.default_rng(9)
    blk = _blk(jax.random.PRNGKey(5), W)
    x = jnp.asarray(rng.standard_normal((N, W)).astype(np.float32))
    ref = _jnp_mlp_sublayer_flat(x, blk["ln2"], blk["mlp"], 1e-5)
    out = _pallas_mlp_fwd_flat(x, blk["ln2"], blk["mlp"], 1e-5, S=S,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)
