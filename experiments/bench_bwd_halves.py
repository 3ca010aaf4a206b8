"""Decompose the image-tower backward by block half (round-2 headroom hunt).

PERF.md r2: train fwd is 90% MFU but the image-tower backward runs at
42-46%@3x — this script isolates WHERE. Each variant is a 12-layer scan over
one half of the ViT-B/32 vision block at the training shape ([512, 50, 768]
bf16), fwd+bwd with every grad leaf forced (partial forcing lets XLA DCE
sibling dW matmuls — see bench_train_decomp.force):

  attn-fused     fused attention sublayer (Pallas fwd + Pallas bwd kernels)
  attn-composed  same math, composed jnp path (XLA bwd)
  mlp            x + mlp(LN2(x)) without checkpointing
  mlp-remat      same under jax.checkpoint (the production "mlp" policy)

Per-variant FLOP accounting reports real MFU at the standard 3x (fwd+bwd)
convention; remat/kernel-recompute extra FLOPs are NOT credited (matches the
tables in PERF.md).

Usage: python -u experiments/bench_bwd_halves.py [--only attn-fused,...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp

from plip_tpu.models.layers import (attention, init_block_stack, layer_norm,
                                    mlp)
from plip_tpu.ops.attention import attention_sublayer

PEAK_BF16 = 197e12

B, S, W, L, HEADS = 512, 50, 768, 12, 12


def force(g):
    return sum(jnp.sum(leaf) for leaf in jax.tree.leaves(g))


def chain_timeit(scalar_fn, params, x, iters=10):
    @jax.jit
    def chain(params, x, n):
        def body(_, xc):
            s = scalar_fn(params, xc)
            return xc + (s * 1e-20).astype(xc.dtype)

        x2 = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(x2[0, 0, 0].astype(jnp.float32))

    float(chain(params, x, 2))
    t0 = time.perf_counter()
    float(chain(params, x, iters))
    return (time.perf_counter() - t0) / iters


def attn_stack(stacked, x, fused: bool):
    def body(h, p):
        if fused:
            h = attention_sublayer(h, p["ln1"], p["attn"], HEADS, False, 1e-5)
        else:
            h = h + attention(layer_norm(h, p["ln1"]), p["attn"], HEADS, False)
        return h, None

    out, _ = jax.lax.scan(body, x, stacked)
    return out


def mlp_stack(stacked, x, remat: bool):
    def half(h, ln2, pm):
        return h + mlp(layer_norm(h, ln2), pm)

    if remat:
        half = jax.checkpoint(half)

    def body(h, p):
        return half(h, p["ln2"], p["mlp"]), None

    out, _ = jax.lax.scan(body, x, stacked)
    return out


def main():
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))

    params = init_block_stack(jax.random.PRNGKey(0), L, W)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, S, W)).astype(np.float32),
                    jnp.bfloat16)

    gf_attn = (8 * S * W * W + 4 * S * S * W) * L * B / 1e9
    gf_mlp = 16 * S * W * W * L * B / 1e9

    variants = [
        ("attn-fused", lambda p, h: attn_stack(p, h, True), gf_attn),
        ("attn-composed", lambda p, h: attn_stack(p, h, False), gf_attn),
        ("mlp", lambda p, h: mlp_stack(p, h, False), gf_mlp),
        ("mlp-remat", lambda p, h: mlp_stack(p, h, True), gf_mlp),
    ]
    for name, fn, gf in variants:
        if only and name not in only:
            continue

        def fwd_scalar(p, h, _fn=fn):
            return jnp.sum(_fn(p, h).astype(jnp.float32)) * 1e-6

        dt = chain_timeit(fwd_scalar, params, x)
        print(f"{name:14s} fwd:     {dt*1e3:6.1f} ms  "
              f"({gf*1e9/dt/PEAK_BF16*100:5.1f}% MFU @1x)")

        def bwd_scalar(p, h, _fn=fn):
            def loss(q):
                out = _fn(q, h)
                return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

            return force(jax.grad(loss)(p))

        dt = chain_timeit(bwd_scalar, params, x)
        print(f"{name:14s} fwd+bwd: {dt*1e3:6.1f} ms  "
              f"({3*gf*1e9/dt/PEAK_BF16*100:5.1f}% MFU @3x)")


if __name__ == "__main__":
    main()
