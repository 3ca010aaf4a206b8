"""Padded-sequence (s_valid) support for the flat fused kernels
(VERDICT r2 #2): ViT-B/16 (S=197) and ViT-L/14 (S=257) geometries pad the
token dim to a multiple of 8 and mask pad columns out of attention, giving
the fused path to towers the S<=128 gate used to exclude.

Oracle chain: masked-composed == unpadded-composed on real rows (exact
semantics), then kernels == masked-composed in interpret mode (fwd + bwd,
including zero grads on pad rows)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plip_tpu.models.layers import init_block_stack


def _blk(key, W):
    return jax.tree.map(lambda a: a[0], init_block_stack(key, 1, W))


def _pad_rows(x3, S_pad):
    B, S, W = x3.shape
    return jnp.pad(x3, ((0, 0), (0, S_pad - S), (0, 0)))


@pytest.mark.parametrize("S,S_pad,causal", [(13, 16, False), (13, 16, True),
                                            (37, 40, False)])
def test_masked_composed_matches_unpadded(S, S_pad, causal):
    """_jnp_attn_sublayer_masked on padded input == the plain composed
    sublayer on the unpadded input, on the real rows."""
    from plip_tpu.ops.attention import (_jnp_attn_sublayer,
                                        _jnp_attn_sublayer_masked)

    rng = np.random.default_rng(11)
    W, heads, B = 64, 4, 3
    p = _blk(jax.random.PRNGKey(8), W)
    x = jnp.asarray(rng.standard_normal((B, S, W)).astype(np.float32))
    ref = _jnp_attn_sublayer(x, p["ln1"], p["attn"], heads, causal, 1e-5)
    out = _jnp_attn_sublayer_masked(_pad_rows(x, S_pad), p["ln1"], p["attn"],
                                    heads, causal, 1e-5, s_valid=S)
    np.testing.assert_allclose(np.asarray(out[:, :S]), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("S,S_pad,bb", [(13, 16, 1), (197, 200, 1),
                                        (197, 200, 2), (257, 264, 2)])
def test_padded_sublayer_kernel_fwd(S, S_pad, bb):
    from plip_tpu.ops.attention import (_jnp_attn_sublayer,
                                        _pallas_attn_sublayer_flat)

    rng = np.random.default_rng(12)
    W, heads, B = 64, 4, 2
    p = _blk(jax.random.PRNGKey(9), W)
    x = jnp.asarray(rng.standard_normal((B, S, W)).astype(np.float32))
    ref = _jnp_attn_sublayer(x, p["ln1"], p["attn"], heads, False, 1e-5)
    x2 = _pad_rows(x, S_pad).reshape(B * S_pad, W)
    out = _pallas_attn_sublayer_flat(x2, p["ln1"], p["attn"], S_pad, heads,
                                     False, 1e-5, block_b=bb, interpret=True,
                                     s_valid=S)
    out = out.reshape(B, S_pad, W)[:, :S]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


@pytest.mark.parametrize("S,S_pad,bb", [(13, 16, 1), (197, 200, 2)])
def test_padded_sublayer_kernel_bwd(S, S_pad, bb):
    """Padded bwd kernel vs jax.vjp of the composed path: real-row grads
    match, pad-row dx is exactly zero, weight grads unpolluted. bb=2 at
    S=200 exercises the row-blocked core backward."""
    from plip_tpu.ops.attention import (_jnp_attn_sublayer,
                                        _pallas_attn_sublayer_bwd_flat)

    rng = np.random.default_rng(13)
    W, heads, B = 64, 4, 2
    p = _blk(jax.random.PRNGKey(10), W)
    x = jnp.asarray(rng.standard_normal((B, S, W)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((B, S, W)).astype(np.float32))
    _, vjp = jax.vjp(
        lambda a, l, m: _jnp_attn_sublayer(a, l, m, heads, False, 1e-5),
        x, p["ln1"], p["attn"])
    ref_dx, ref_dln, ref_dattn = vjp(g)
    x2 = _pad_rows(x, S_pad).reshape(B * S_pad, W)
    g2 = _pad_rows(g, S_pad).reshape(B * S_pad, W)
    dx, dln, dattn = _pallas_attn_sublayer_bwd_flat(
        x2, g2, p["ln1"], p["attn"], S_pad, heads, False, 1e-5, block_b=bb,
        interpret=True, s_valid=S)
    dx3 = dx.reshape(B, S_pad, W)
    np.testing.assert_allclose(np.asarray(dx3[:, :S]), np.asarray(ref_dx),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_array_equal(np.asarray(dx3[:, S:]),
                                  np.zeros((B, S_pad - S, W), np.float32))
    for a, b in zip(jax.tree.leaves((dln, dattn)),
                    jax.tree.leaves((ref_dln, ref_dattn))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=5e-4)


def test_padded_block_bwd_kernel():
    """Whole-block bwd kernel at a padded geometry vs the unpadded composed
    block VJP (pad rows excluded)."""
    from plip_tpu.ops.block_bwd import (_jnp_block_flat,
                                        _pallas_block_bwd_flat)

    rng = np.random.default_rng(14)
    W, heads, B, S, S_pad = 64, 4, 2, 13, 16
    p = _blk(jax.random.PRNGKey(11), W)
    x = jnp.asarray(rng.standard_normal((B, S, W)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((B, S, W)).astype(np.float32))
    _, vjp = jax.vjp(
        lambda a, b: _jnp_block_flat(a.reshape(B * S, W), b, S, heads,
                                     False, 1e-5, "quick_gelu"),
        x, p)
    ref_dx, ref_dp = vjp(g.reshape(B * S, W))
    x2 = _pad_rows(x, S_pad).reshape(B * S_pad, W)
    g2 = _pad_rows(g, S_pad).reshape(B * S_pad, W)
    dx, dp = _pallas_block_bwd_flat(x2, g2, p, S_pad, heads, False, 1e-5,
                                    block_b=1, interpret=True, s_valid=S)
    dx3 = dx.reshape(B, S_pad, W)
    np.testing.assert_allclose(
        np.asarray(dx3[:, :S]),
        np.asarray(ref_dx).reshape(B, S, W), rtol=5e-4, atol=5e-4)
    np.testing.assert_array_equal(np.asarray(dx3[:, S:]),
                                  np.zeros((B, S_pad - S, W), np.float32))
    for a, b in zip(jax.tree.leaves(dp), jax.tree.leaves(ref_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=5e-4)


def test_picker_long_seq():
    """S>128 geometries (row-blocked core): dense M = bb*S grows to the
    _MAX_FLAT_M working-set cap; unpadded S=197 has no legal block (forcing
    the tower-level pad)."""
    from plip_tpu.ops.attention import _flat_want, _sublayer_block_b

    assert _flat_want(50) == 4 and _flat_want(264) == 4
    assert _sublayer_block_b(512, 200, 4) == 4   # B/16 padded: M=800
    assert _sublayer_block_b(512, 264, 4) == 4   # L/14 padded: M=1056
    assert _sublayer_block_b(64, 264, 4) == 4
    assert _sublayer_block_b(64, 584, 4) == 1    # L/14@336px: bb*584 cap
    assert _sublayer_block_b(512, 197, 4) is None  # 197 % 8 != 0, bb*197>cap
    # short-S optima preserved
    assert _sublayer_block_b(512, 50, 4) == 4
    assert _sublayer_block_b(512, 80, 4) == 4


def test_fwd_only_width_gate(monkeypatch):
    """Per-pass dispatch at S>128 (PERF.md round 3): forward-only (remat=
    False) pads into the flat path only at W <= _FLAT_FWD_ONLY_MAX_W;
    training (any remat policy) pads at every width. Short-S towers take
    the flat path unconditionally. Measured basis: L/14 encode composed
    75.6 ms < flat 77.5+; L/14 train flat 333.2 < composed 341.1."""
    import plip_tpu.models.layers as L
    from plip_tpu.models.layers import init_block_stack, transformer
    from plip_tpu.ops import attention as A

    calls = []

    def spy_flat(x2, ln_p, attn_p, S, heads, causal=False, eps=1e-5,
                 s_valid=None):
        calls.append((S, s_valid))
        return A._jnp_sublayer_flat_dispatch(x2, ln_p, attn_p, S, heads,
                                             causal, eps, s_valid)

    # simulate the TPU gate on CPU (real picker logic, _use_pallas forced)
    monkeypatch.setattr(
        A, "_flat_pallas_ok",
        lambda N, S, p: (S <= A._MAX_FLAT_M and "kernel" in p["qkv"] and
                         A._sublayer_block_b(N // S, S, A._flat_want(S))
                         is not None))
    monkeypatch.setattr(A, "attention_sublayer_flat", spy_flat)

    def run(W, S, remat):
        calls.clear()
        p = init_block_stack(jax.random.PRNGKey(0), 1, W)
        # B=8 keeps B*S above _MAX_FLAT_M so the whole-array fallback
        # (legal at tiny batch) doesn't pass the UNPADDED S=197 gate
        x = jnp.zeros((8, S, W))
        transformer(x, p, 4, remat=remat)
        return list(calls)

    wide = L._FLAT_FWD_ONLY_MAX_W + 256
    # W > gate, fwd-only: stays composed-3D (no flat call, no padding)
    assert run(wide, 197, False) == []
    # W > gate, training: pads 197 -> 200 into the flat path
    assert run(wide, 197, "mlp") == [(200, 197)]
    # W <= gate: flat in both passes
    assert run(512, 197, False) == [(200, 197)]
    assert run(512, 197, "mlp") == [(200, 197)]
    # short-S: flat path regardless of width/remat (unpadded)
    assert run(wide, 50, False) == [(50, None)]
