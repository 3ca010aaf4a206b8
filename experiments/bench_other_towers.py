"""Model-family coverage numbers: ViT-B/16 encode and ViT-L/14 training.

Since round 3 both towers take the PADDED fused flat path (S=197 -> 200,
S=257 -> 264, block_b=1, s_valid masking; ops/attention). remat="block"
additionally runs the whole-block backward kernel (ops/block_bwd)."""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp

from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig
from plip_tpu.train.contrastive import (init_train_state, make_optimizer,
                                        make_train_step)

PEAK_BF16 = 197e12


def tower_gflops(width, layers, S, patch=None, embed=None):
    per_layer = (12 * S * width * width + 2 * S * S * width) * 2
    g = layers * per_layer
    if patch:
        g += S * patch * patch * 3 * width * 2
    if embed:
        g += S * width * embed * 2
    return g / 1e9


def chain_timeit(fn, params, px, iters=10):
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
    return (time.perf_counter() - t0) / iters


def encode_b16():
    cfg = CLIPConfig.vit_b16()
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = 256
    px = jnp.asarray(rng.standard_normal((batch, 224, 224, 3)).astype(np.float32))
    gfl = tower_gflops(768, 12, cfg.vision.seq_len, patch=16, embed=512)
    enc = lambda p, x: jclip.encode_image(p, x, cfg, dtype=jnp.bfloat16)
    dt = chain_timeit(enc, params, px)
    print(f"ViT-B/16 encode b{batch}: {batch/dt:6,.0f} img/s "
          f"({dt*1e3:.1f} ms, {gfl:.1f} GFLOP/img, "
          f"{batch*gfl*1e9/dt/PEAK_BF16*100:.0f}% MFU)")


def train_l14(batch):
    cfg = CLIPConfig.vit_l14()
    params = jclip.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    px = jnp.asarray(rng.standard_normal((batch, 224, 224, 3)).astype(np.float32))
    ids_np = np.zeros((batch, 77), np.int32)
    ids_np[:, 0] = 49406
    ids_np[:, 1] = np.arange(batch) % 49000
    ids_np[:, 2] = 49407
    ids = jnp.asarray(ids_np)
    gfl = (tower_gflops(1024, 24, cfg.vision.seq_len, patch=14, embed=768)
           + tower_gflops(768, 12, 77, embed=768))
    opt = make_optimizer(total_steps=100)
    remats = (("block",) if "--block-only" in sys.argv
              else ("block", "mlp", True))
    for remat in remats:
        try:
            step = make_train_step(cfg, opt, dtype=jnp.bfloat16, remat=remat)
            # copy: donation below deletes the state's buffers, and params
            # is shared across the remat variants
            state = init_train_state(jax.tree.map(jnp.copy, params), opt)

            # donate the carried state: at L/14 the (params+opt_state) pytree
            # is ~5.1 GB fp32 — without donation the outer jit keeps input
            # AND output copies alive and the 16 GB chip OOMs
            @functools.partial(jax.jit, donate_argnums=(0,))
            def steps(state, px, ids, n):
                def body(_, s):
                    s2, _ = step(s, px, ids)
                    return s2

                return jax.lax.fori_loop(0, n, body, state)

            s2 = steps(state, px, ids, 2)
            state = None
            float(s2.params["logit_scale"])
            t0 = time.perf_counter()
            s3 = steps(s2, px, ids, 10)
            float(s3.params["logit_scale"])
            dt = (time.perf_counter() - t0) / 10
            print(f"ViT-L/14 train b{batch} remat={remat!s:5s}: "
                  f"{batch/dt:6,.0f} pairs/s ({dt*1e3:.1f} ms, "
                  f"MFU {batch*3*gfl*1e9/dt/PEAK_BF16*100:.0f}%@3x)")
            del state, s2, s3
        except Exception as e:
            print(f"ViT-L/14 train b{batch} remat={remat}: FAILED "
                  f"{type(e).__name__}: {str(e)[:150]}")


if __name__ == "__main__":
    if "--l14" in sys.argv:
        train_l14(int(sys.argv[sys.argv.index("--l14") + 1]))
    else:
        encode_b16()
