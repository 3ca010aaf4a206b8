"""Randomized geometry sweep for the flat fused sublayer kernels.

The fixed-case tests pin the shipped tower geometries (ViT-B/32/B16/L14 and
the text tower); this fuzz sweep draws random (B, S, S_pad, W, heads,
block_b, causal) combinations — including ones no CLIP config uses — and
checks the Pallas flat kernels against the composed oracle in interpret
mode, forward AND backward (input grad + every weight grad). Guards the
dispatch/masking/mosaic-layout edge cases (odd S, pad-to-8 s_valid, bb that
doesn't divide B*S cleanly) that a future geometry could hit first.

Reference contract: arbitrary CLIP arch strings are loadable
(`/root/reference/reproducibility/embedders/factory.py:21`,
`/root/reference/config_example.env:4`), so kernel correctness cannot be
pinned to the shipped geometries only.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import plip_tpu.ops.attention as A
from plip_tpu.models.layers import init_block_stack


def _blk(key, W):
    return jax.tree.map(lambda a: a[0], init_block_stack(key, 1, W))


def _geometries(n=6, seed=123):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        heads = int(rng.choice([1, 2, 4]))
        W = heads * int(rng.choice([8, 16, 32]))
        S = int(rng.integers(3, 41))
        S_pad = -(-S // 8) * 8  # pad to multiple of 8 like the towers do
        B = int(rng.choice([1, 2, 3, 4]))
        bb = int(rng.choice([1, 2, 4]))
        causal = bool(rng.integers(0, 2))
        out.append((B, S, S_pad, W, heads, bb, causal))
    return out


@pytest.mark.parametrize("B,S,S_pad,W,heads,bb,causal", _geometries())
def test_flat_kernel_fuzz_fwd_bwd(B, S, S_pad, W, heads, bb, causal):
    if B % bb:
        bb = 1
    # S_pad is a multiple of 8 by construction, so every (bb, S_pad) draw
    # satisfies Mosaic's (bb*S_pad) % 8 sublane rule — no skips needed.
    rng = np.random.default_rng(hash((B, S, W, heads, bb, causal)) % 2**32)
    p = _blk(jax.random.PRNGKey(17), W)
    x = jnp.asarray(rng.standard_normal((B, S, W)).astype(np.float32))
    x2 = jnp.pad(x, ((0, 0), (0, S_pad - S), (0, 0))).reshape(B * S_pad, W)
    s_valid = S if S < S_pad else None

    # composed oracle on the UNPADDED input
    def oracle(x, ln_p, attn_p):
        return A._jnp_attn_sublayer(x, ln_p, attn_p, heads, causal, 1e-5)

    ref = oracle(x, p["ln1"], p["attn"])
    out = A._pallas_attn_sublayer_flat(
        x2, p["ln1"], p["attn"], S_pad, heads, causal, 1e-5, block_b=bb,
        interpret=True, s_valid=s_valid,
    ).reshape(B, S_pad, W)
    np.testing.assert_allclose(np.asarray(out[:, :S]), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)

    # backward: cotangent nonzero only on real rows (callers slice pads away)
    g = jnp.asarray(rng.standard_normal((B, S, W)).astype(np.float32))
    _, vjp = jax.vjp(oracle, x, p["ln1"], p["attn"])
    dref_x, dref_ln, dref_attn = vjp(g)
    g2 = jnp.pad(g, ((0, 0), (0, S_pad - S), (0, 0))).reshape(B * S_pad, W)
    dx2, dln, dattn = A._pallas_attn_sublayer_bwd_flat(
        x2, g2, p["ln1"], p["attn"], S_pad, heads, causal, 1e-5, block_b=bb,
        interpret=True, s_valid=s_valid,
    )
    dx3 = dx2.reshape(B, S_pad, W)
    np.testing.assert_allclose(np.asarray(dx3[:, :S]), np.asarray(dref_x),
                               rtol=3e-5, atol=3e-5)
    # pad-row input grads must be exactly zero (nothing reads pad rows)
    if S < S_pad:
        np.testing.assert_array_equal(np.asarray(dx3[:, S:]), 0.0)
    for k in ("scale", "bias"):
        np.testing.assert_allclose(np.asarray(dln[k]), np.asarray(dref_ln[k]),
                                   rtol=3e-5, atol=3e-5)
    for mod in ("qkv", "out"):
        for k in ("kernel", "bias"):
            np.testing.assert_allclose(
                np.asarray(dattn[mod][k]), np.asarray(dref_attn[mod][k]),
                rtol=3e-5, atol=3e-5)
