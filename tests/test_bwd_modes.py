"""Backward-formulation variants of the flat attention sublayer:

- dW-split kernel (`_pallas_attn_sublayer_bwd_split`): dx chain in Pallas,
  dWqkv/dWout as XLA dots on kernel-emitted (ln, ctx, dqkv) — grad parity
  vs the composed-path `jax.vjp` oracle.
- save-qkv forward (`emit_qkv=True`): emitted QKV activations feed the split
  backward so it skips its recompute matmul — output + grad parity.
- row-blocked core at S <= 128 (`_ROW_CORE_OVERRIDE`): legal when S % 8 == 0
  (measured neutral-to-negative on v5e, kept as an experiment switch — this
  pins that the formulation stays exact).

All in Pallas interpret mode on small shapes (CPU-safe)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import plip_tpu.ops.attention as A


def _mk(B, S, W, heads, causal, seed=0):
    key = jax.random.PRNGKey(seed)
    k0, k1, k2, k3, k4, k5 = jax.random.split(key, 6)
    x = jax.random.normal(k0, (B * S, W), jnp.float32) * 0.5
    ln_p = {"scale": jnp.ones((W,)) * 1.1, "bias": jnp.zeros((W,)) + 0.05}
    attn_p = {
        "qkv": {"kernel": jax.random.normal(k1, (W, 3 * W)) * 0.02,
                "bias": jax.random.normal(k2, (3 * W,)) * 0.01},
        "out": {"kernel": jax.random.normal(k3, (W, W)) * 0.02,
                "bias": jax.random.normal(k4, (W,)) * 0.01},
    }
    g = jax.random.normal(k5, (B * S, W)) * 0.3
    return x, ln_p, attn_p, g


def _oracle(x, ln_p, attn_p, g, S, heads, causal):
    def composed(x, lp, ap):
        return A._jnp_sublayer_flat_dispatch(x, lp, ap, S, heads, causal,
                                             1e-5, None)
    out, vjp = jax.vjp(composed, x, ln_p, attn_p)
    return (out,) + vjp(g)


def _assert_grads_close(got, want, tol=2e-5):
    dx_g, dlp_g, dap_g = got
    dx_w, dlp_w, dap_w = want
    np.testing.assert_allclose(np.asarray(dx_g), np.asarray(dx_w),
                               rtol=tol, atol=tol)
    for leaf_g, leaf_w in zip(jax.tree.leaves((dlp_g, dap_g)),
                              jax.tree.leaves((dlp_w, dap_w))):
        np.testing.assert_allclose(np.asarray(leaf_g), np.asarray(leaf_w),
                                   rtol=tol, atol=2e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_dwsplit_bwd_matches_oracle(causal):
    B, S, W, heads = 4, 24, 128, 2
    x, ln_p, attn_p, g = _mk(B, S, W, heads, causal)
    _, dx_w, dlp_w, dap_w = _oracle(x, ln_p, attn_p, g, S, heads, causal)
    got = A._pallas_attn_sublayer_bwd_split(
        x, g, ln_p, attn_p, S, heads, causal, 1e-5, block_b=2,
        interpret=True)
    _assert_grads_close(got, (dx_w, dlp_w, dap_w))


def test_dwsplit_matches_fused_kernel():
    """The two hand-written backwards must agree with each other too."""
    B, S, W, heads = 4, 24, 128, 2
    x, ln_p, attn_p, g = _mk(B, S, W, heads, False, seed=3)
    fused = A._pallas_attn_sublayer_bwd_flat(
        x, g, ln_p, attn_p, S, heads, False, 1e-5, block_b=2, interpret=True)
    split = A._pallas_attn_sublayer_bwd_split(
        x, g, ln_p, attn_p, S, heads, False, 1e-5, block_b=2, interpret=True)
    _assert_grads_close(split, fused)


def test_saveqkv_roundtrip():
    """Forward emit_qkv output == plain forward; split backward fed the
    saved QKV == recompute path."""
    B, S, W, heads = 4, 24, 128, 2
    x, ln_p, attn_p, g = _mk(B, S, W, heads, True, seed=5)
    out_plain = A._pallas_attn_sublayer_flat(
        x, ln_p, attn_p, S, heads, True, 1e-5, block_b=2, interpret=True)
    out_emit, qkv = A._pallas_attn_sublayer_flat(
        x, ln_p, attn_p, S, heads, True, 1e-5, block_b=2, interpret=True,
        emit_qkv=True)
    np.testing.assert_array_equal(np.asarray(out_plain), np.asarray(out_emit))
    rec = A._pallas_attn_sublayer_bwd_split(
        x, g, ln_p, attn_p, S, heads, True, 1e-5, block_b=2, interpret=True)
    sav = A._pallas_attn_sublayer_bwd_split(
        x, g, ln_p, attn_p, S, heads, True, 1e-5, block_b=2, interpret=True,
        qkv2=qkv)
    _assert_grads_close(sav, rec, tol=1e-6)


@pytest.mark.parametrize("causal", [False, True])
def test_row_core_override_exact(causal):
    """Row-blocked core at S % 8 == 0 is exact vs block-diag (fwd + bwd)."""
    B, S, W, heads = 4, 16, 128, 2
    x, ln_p, attn_p, g = _mk(B, S, W, heads, causal, seed=7)
    base_f = A._pallas_attn_sublayer_flat(
        x, ln_p, attn_p, S, heads, causal, 1e-5, block_b=2, interpret=True)
    base_b = A._pallas_attn_sublayer_bwd_flat(
        x, g, ln_p, attn_p, S, heads, causal, 1e-5, block_b=2,
        interpret=True)
    A._ROW_CORE_OVERRIDE = {"fwd": True, "bwd": True}
    try:
        row_f = A._pallas_attn_sublayer_flat(
            x, ln_p, attn_p, S, heads, causal, 1e-5, block_b=2,
            interpret=True)
        row_b = A._pallas_attn_sublayer_bwd_flat(
            x, g, ln_p, attn_p, S, heads, causal, 1e-5, block_b=2,
            interpret=True)
    finally:
        A._ROW_CORE_OVERRIDE = None
    np.testing.assert_allclose(np.asarray(base_f), np.asarray(row_f),
                               rtol=1e-6, atol=1e-6)
    _assert_grads_close(row_b, base_b, tol=1e-6)


def test_core_chunk_policy():
    """Default policy: row-blocked (chunk=1) above S=128; chunk=2 for
    S <= 128 where legal (the measured round-3 text-tower winner); chunks
    whose (c*S) % 8 != 0 or that don't divide block_b fall back to
    whole-block."""
    assert A._core_chunk(264, 4, bwd=True) == 1
    assert A._core_chunk(264, 4, bwd=False) == 1
    assert A._core_chunk(264, 1, bwd=True) is None   # chunk >= bb: whole
    assert A._core_chunk(80, 8, bwd=True) == 2       # text: 4x [160, 160]
    assert A._core_chunk(80, 8, bwd=False) == 2
    assert A._core_chunk(80, 2, bwd=True) is None    # chunk >= bb: whole
    assert A._core_chunk(50, 4, bwd=True) is None    # (2*50) % 8: illegal
    A._ROW_CORE_OVERRIDE = {"fwd": False, "bwd": True}
    try:
        assert A._core_chunk(80, 8, bwd=True) == 1
        assert A._core_chunk(80, 8, bwd=False) is None
        assert A._core_chunk(50, 4, bwd=True) is None  # 50 % 8: never legal
    finally:
        A._ROW_CORE_OVERRIDE = None
    A._ROW_CORE_OVERRIDE = {"fwd": 4, "bwd": 2}
    try:
        assert A._core_chunk(80, 8, bwd=False) == 4   # 2 dots of [320, 320]
        assert A._core_chunk(80, 8, bwd=True) == 2    # 4 dots of [160, 160]
        assert A._core_chunk(80, 3, bwd=False) is None  # 3 % 4: fall back
        assert A._core_chunk(50, 8, bwd=True) is None  # (2*50) % 8 != 0
        assert A._core_chunk(56, 8, bwd=True) == 2     # (2*56) % 8 == 0
    finally:
        A._ROW_CORE_OVERRIDE = None


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("chunk", [1, 2])
def test_core_chunk_override_exact(causal, chunk):
    """Chunked core ([c*S, c*S] masked dots) is exact vs whole-block
    block-diag (fwd + bwd) — including PAD-column masking (s_valid)."""
    B, S, W, heads = 4, 16, 64, 2
    x, ln_p, attn_p, g = _mk(B, S, W, heads, causal, seed=13)
    base_f = A._pallas_attn_sublayer_flat(
        x, ln_p, attn_p, S, heads, causal, 1e-5, block_b=4, interpret=True,
        s_valid=13)
    base_b = A._pallas_attn_sublayer_bwd_flat(
        x, g, ln_p, attn_p, S, heads, causal, 1e-5, block_b=4,
        interpret=True, s_valid=13)
    A._ROW_CORE_OVERRIDE = {"fwd": chunk, "bwd": chunk}
    try:
        chk_f = A._pallas_attn_sublayer_flat(
            x, ln_p, attn_p, S, heads, causal, 1e-5, block_b=4,
            interpret=True, s_valid=13)
        chk_b = A._pallas_attn_sublayer_bwd_flat(
            x, g, ln_p, attn_p, S, heads, causal, 1e-5, block_b=4,
            interpret=True, s_valid=13)
    finally:
        A._ROW_CORE_OVERRIDE = None
    np.testing.assert_allclose(np.asarray(base_f), np.asarray(chk_f),
                               rtol=1e-6, atol=1e-6)
    _assert_grads_close(chk_b, base_b, tol=1e-6)


@pytest.mark.parametrize("causal", [False, True])
def test_mha_core_s_valid(causal):
    """fused_attention's per-row kernel masks PAD columns >= s_valid
    identically to the jnp reference (fwd + bwd kernels, interpret mode)."""
    B, S, H, D = 2, 24, 2, 8
    rng = np.random.default_rng(11)
    qkv = jnp.asarray(rng.standard_normal((B, S, 3 * H * D)).astype(np.float32))
    ref = A._jnp_mha(qkv, H, causal, s_valid=20)
    out = A._pallas_mha(qkv, H, causal, interpret=True, s_valid=20)
    np.testing.assert_allclose(np.asarray(out)[:, :20], np.asarray(ref)[:, :20],
                               rtol=2e-5, atol=2e-5)
    g = jnp.asarray(rng.standard_normal((B, S, H * D)).astype(np.float32))
    # zero pad-row grads like a caller that slices them away
    g = g.at[:, 20:].set(0.0)
    _, vjp = jax.vjp(lambda a: A._jnp_mha(a, H, causal, s_valid=20), qkv)
    (dref,) = vjp(g)
    dout = A._pallas_mha_bwd(qkv, g, H, causal, interpret=True, s_valid=20)
    np.testing.assert_allclose(np.asarray(dout), np.asarray(dref),
                               rtol=2e-5, atol=2e-5)


def test_hybrid_composed_train_fwd_matches_kernel():
    """The composed train-forward (hybrid mode for wide towers) equals the
    fused flat kernel forward bit-for-bit in math terms (same islands)."""
    B, S, W, heads = 4, 24, 128, 2
    x, ln_p, attn_p, g = _mk(B, S, W, heads, False, seed=9)
    kern = A._pallas_attn_sublayer_flat(
        x, ln_p, attn_p, S, heads, False, 1e-5, block_b=2, interpret=True)
    comp = A._jnp_sublayer_flat_dispatch(x, ln_p, attn_p, S, heads, False,
                                         1e-5, None)
    np.testing.assert_allclose(np.asarray(kern), np.asarray(comp),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_pipe_fwd_override_parity(causal):
    """Pipelined + deferred-divide flat fwd core (the S > 128 default) is an
    fp-reassociation of the round-2 schedule: parity within fp32 tolerance,
    including PAD-column masking (s_valid)."""
    B, S, W, heads = 4, 16, 64, 2
    x, ln_p, attn_p, _ = _mk(B, S, W, heads, causal, seed=17)
    A._PIPE_FWD_OVERRIDE = False
    try:
        base = A._pallas_attn_sublayer_flat(
            x, ln_p, attn_p, S, heads, causal, 1e-5, block_b=4,
            interpret=True, s_valid=13)
    finally:
        A._PIPE_FWD_OVERRIDE = None
    A._PIPE_FWD_OVERRIDE = True
    try:
        pipe = A._pallas_attn_sublayer_flat(
            x, ln_p, attn_p, S, heads, causal, 1e-5, block_b=4,
            interpret=True, s_valid=13)
    finally:
        A._PIPE_FWD_OVERRIDE = None
    np.testing.assert_allclose(np.asarray(base), np.asarray(pipe),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_pipe_bwd_override_parity(causal):
    """Pipelined backward core (shipped default) vs the round-2 schedule:
    grads agree to fp32-reassociation tolerance on both hand-written
    backwards (fused and dW-split)."""
    B, S, W, heads = 4, 24, 128, 2
    x, ln_p, attn_p, g = _mk(B, S, W, heads, causal, seed=19)
    out = {}
    for pipe in (False, True):
        A._PIPE_BWD_OVERRIDE = pipe
        try:
            out[pipe] = (
                A._pallas_attn_sublayer_bwd_flat(
                    x, g, ln_p, attn_p, S, heads, causal, 1e-5, block_b=2,
                    interpret=True),
                A._pallas_attn_sublayer_bwd_split(
                    x, g, ln_p, attn_p, S, heads, causal, 1e-5, block_b=2,
                    interpret=True),
            )
        finally:
            A._PIPE_BWD_OVERRIDE = None
    _assert_grads_close(out[True][0], out[False][0])
    _assert_grads_close(out[True][1], out[False][1])
    # and the pipelined default still matches the composed oracle
    _, dx_w, dlp_w, dap_w = _oracle(x, ln_p, attn_p, g, S, heads, causal)
    _assert_grads_close(out[True][0], (dx_w, dlp_w, dap_w))


def test_mha_pipelined_branch_parity():
    """_mha_kernel's S > 128 software-pipelined branch (ViT-L/14 encode path)
    matches the jnp reference — the branch is shape-gated, so drive it with
    an actual S = 136 geometry."""
    B, S, H, D = 2, 136, 2, 8
    rng = np.random.default_rng(23)
    qkv = jnp.asarray(
        rng.standard_normal((B, S, 3 * H * D)).astype(np.float32))
    ref = A._jnp_mha(qkv, H, False, s_valid=130)
    out = A._pallas_mha(qkv, H, False, interpret=True, s_valid=130)
    np.testing.assert_allclose(np.asarray(out)[:, :130],
                               np.asarray(ref)[:, :130],
                               rtol=2e-5, atol=2e-5)


def test_train_fwd_composed_policy():
    assert A._train_fwd_composed(1024, 264) is True
    assert A._train_fwd_composed(768, 200) is False   # B/16: flat fwd wins
    assert A._train_fwd_composed(1024, 257) is False  # unaligned reshape
    # L/14@336px (S padded to 584): above 512 the composed path's
    # fused_attention would fall off the s_valid-masked per-row kernel onto
    # the [B,H,S,S] einsum — hybrid must stay off.
    assert A._train_fwd_composed(1024, 584) is False
    A._TRAIN_FWD_COMPOSED_OVERRIDE = False
    try:
        assert A._train_fwd_composed(1024, 264) is False
    finally:
        A._TRAIN_FWD_COMPOSED_OVERRIDE = None
    A._TRAIN_FWD_COMPOSED_OVERRIDE = True
    try:
        assert A._train_fwd_composed(512, 80) is True   # override widens W
        assert A._train_fwd_composed(512, 584) is False  # but never S>512
    finally:
        A._TRAIN_FWD_COMPOSED_OVERRIDE = None
