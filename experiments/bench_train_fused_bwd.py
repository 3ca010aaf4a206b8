"""Training step: composed sublayer (round-1 default) vs fused sublayer with
the hand-written Pallas backward kernel (VERDICT r1 #2).

Round-1 context: the fused sublayer's VJP fell back to jax.vjp over the
composed forward, measuring 1,482 pairs/s vs 1,661 composed at batch 256 —
so training kept the composed path. The new `_pallas_attn_sublayer_bwd`
kernel computes dx + all weight grads in VMEM with fp32 accumulators across
the grid; this script decides whether training flips to the fused path.
Target: >1,800 pairs/s at batch 512 (round 1: 1,670)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp

import plip_tpu.models.layers as L
from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig
from plip_tpu.train.contrastive import (init_train_state, make_optimizer,
                                        make_train_step)

PEAK_BF16 = 197e12


def pair_gflops(cfg):
    def tower(width, layers, S, extra=0.0):
        per_layer = (12 * S * width * width + 2 * S * S * width) * 2
        return (layers * per_layer) / 1e9 + extra

    v, t = cfg.vision, cfg.text
    img = tower(v.width, v.layers, v.seq_len,
                extra=(v.seq_len * v.patch_size ** 2 * 3 * v.width * 2
                       + v.seq_len * v.width * cfg.embed_dim * 2) / 1e9)
    txt = tower(t.width, t.layers, t.context_length,
                extra=(t.context_length * t.width * cfg.embed_dim * 2) / 1e9)
    return img + txt


def run(step, state, px, ids, iters=10):
    @jax.jit
    def steps(state, px, ids, n):
        def body(_, s):
            s2, _ = step(s, px, ids)
            return s2

        return jax.lax.fori_loop(0, n, body, state)

    s2 = steps(state, px, ids, 2)
    float(s2.params["logit_scale"])
    t0 = time.perf_counter()
    s3 = steps(s2, px, ids, iters)
    float(s3.params["logit_scale"])
    return (time.perf_counter() - t0) / iters


def main():
    cfg = CLIPConfig.vit_b32()
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    gfl = pair_gflops(cfg)
    rng = np.random.default_rng(0)
    opt = make_optimizer(total_steps=100)
    orig_block = L.block

    def fused_block(x, p, heads, causal=False, eps=1e-5, act="quick_gelu",
                    fused_sublayer=True):
        return orig_block(x, p, heads, causal, eps, act, fused_sublayer=True)

    for batch in (256, 512, 1024):
        px = jnp.asarray(
            rng.standard_normal((batch, 224, 224, 3)).astype(np.float32))
        ids_np = np.zeros((batch, 77), np.int32)
        ids_np[:, 0] = 49406
        ids_np[:, 1] = np.arange(batch) % 49000
        ids_np[:, 2] = 49407
        ids = jnp.asarray(ids_np)

        for name, blk in (("composed", orig_block), ("fused-bwd", fused_block)):
            L.block = blk
            try:
                step = make_train_step(cfg, opt, dtype=jnp.bfloat16, remat=True)
                state = init_train_state(params, opt)
                dt = run(step, state, px, ids)
                print(f"b={batch} {name:9s}: {dt*1e3:7.1f} ms "
                      f"{batch/dt:7,.0f} pairs/s "
                      f"(MFU {batch*3*gfl*1e9/dt/PEAK_BF16*100:.0f}%@3x)")
                del state
            except Exception as e:
                print(f"b={batch} {name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}")
            finally:
                L.block = orig_block


if __name__ == "__main__":
    main()
