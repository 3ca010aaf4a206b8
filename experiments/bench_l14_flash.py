"""ViT-L/14 encode: per-row attention kernel vs S-blocked flash dispatch.

Round-1 baseline: 792 img/s/chip at batch 128 (~33% MFU at 81 GFLOP/img).
VERDICT r1 target: >= 1,100 img/s (>= 45% MFU)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp

import plip_tpu.ops.attention as A
from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig


def timeit(fn, params, px, iters=20):
    @jax.jit
    def chain(params, px, n):
        def body(_, p):
            out = fn(params, p)
            return p + (jnp.sum(out) * 1e-20).astype(p.dtype)

        px2 = jax.lax.fori_loop(0, n, body, px)
        return jnp.sum(px2[0, 0, 0])

    float(chain(params, px, 2))
    t0 = time.perf_counter()
    float(chain(params, px, iters))
    return time.perf_counter() - t0


def gflops_per_image(cfg):
    v = cfg.vision
    S = v.seq_len
    per_layer = (
        4 * S * v.width * v.width * 2      # qkv + out proj
        + 2 * S * S * v.width * 2          # qk^T + pv
        + 8 * S * v.width * v.width * 2    # mlp
    )
    patch = S * (v.patch_size ** 2 * 3) * v.width * 2
    proj = S * v.width * cfg.embed_dim * 2
    return (v.layers * per_layer + patch + proj) / 1e9


PEAK_BF16 = 197e12  # v5e


def main():
    cfg = CLIPConfig.vit_l14()
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    gfl = gflops_per_image(cfg)
    print(f"L/14: {gfl:.1f} GFLOP/img, S={cfg.vision.seq_len}")

    enc = lambda p, x: jclip.encode_image(p, x, cfg, dtype=jnp.bfloat16)
    orig_fused = A.fused_attention

    for batch in (128, 256):
        px = jnp.asarray(rng.standard_normal(
            (batch, cfg.vision.image_size, cfg.vision.image_size, 3)
        ).astype(np.float32))
        iters = 10

        # v0: round-1 per-row kernel (force old dispatch)
        A.fused_attention = lambda qkv, heads, causal=False: A._pallas_mha(
            qkv, heads, causal)
        dt = timeit(enc, params, px, iters)
        r = batch * iters / dt
        print(f"batch={batch} per-row kernel: {r:,.0f} img/s "
              f"({r * gfl * 1e9 / PEAK_BF16 * 100:.1f}% MFU)")

        # v1: flash dispatch (current default)
        A.fused_attention = orig_fused
        dt = timeit(enc, params, px, iters)
        r = batch * iters / dt
        print(f"batch={batch} flash (bq={A._flash_block_q(cfg.vision.seq_len)}): "
              f"{r:,.0f} img/s ({r * gfl * 1e9 / PEAK_BF16 * 100:.1f}% MFU)")

        # head-grid kernel (single q block, qkv fetched once), hpp sweep
        for hpp in (2, 4, 8, 16):
            A.fused_attention = (
                lambda qkv, heads, causal=False, _h=hpp:
                A._pallas_mha_headgrid(qkv, heads, causal, hpp=_h))
            dt = timeit(enc, params, px, iters)
            r = batch * iters / dt
            print(f"batch={batch} headgrid hpp={hpp}: {r:,.0f} img/s "
                  f"({r * gfl * 1e9 / PEAK_BF16 * 100:.1f}% MFU)")
        A.fused_attention = orig_fused


if __name__ == "__main__":
    main()
