"""ViT-B/32 encode: fused whole-block kernel vs sublayer-fused + XLA MLP.

Round-1 best: 13.3k img/s (38.5 ms/batch-512). VERDICT r1 #1 target:
>= 15k img/s, or a measured negative result with decomposition."""

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
from plip_tpu.ops.block import _pallas_block


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


def main():
    cfg = CLIPConfig.vit_b32()
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = 512
    px = jnp.asarray(rng.standard_normal((batch, 224, 224, 3)).astype(np.float32))
    enc = lambda p, x: jclip.encode_image(p, x, cfg, dtype=jnp.bfloat16)
    orig_block = L.block

    dt = timeit(enc, params, px)
    print(f"default (fused sublayer + XLA MLP): {batch*20/dt:,.0f} img/s "
          f"({dt/20*1e3:.1f} ms)")

    for bb in (4, 8, 16, 32):
        def fused(x, p, heads, causal=False, eps=1e-5, act="quick_gelu",
                  fused_sublayer=True, _bb=bb):
            return _pallas_block(x, p, heads, causal, eps, block_b=_bb)

        L.block = fused
        try:
            dt = timeit(enc, params, px)
            print(f"fused block (block_b={bb}): {batch*20/dt:,.0f} img/s "
                  f"({dt/20*1e3:.1f} ms)")
        except Exception as e:
            print(f"fused block (block_b={bb}): FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")
        finally:
            L.block = orig_block

    # text tower (S=77, width 512)
    ids = np.zeros((1024, 77), np.int32)
    ids[:, 0] = 49406
    ids[:, 1] = np.arange(1024) % 49000
    ids[:, 2] = 49407
    idsj = jnp.asarray(ids)

    def timeit_txt(fn, iters=20):
        # chain via a used-parameter perturbation so the loop body cannot be
        # hoisted (ids are loop-invariant ints)
        @jax.jit
        def chain(params, ids, n):
            def body(_, kern):
                p2 = {**params, "text": {**params["text"],
                                         "proj": {"kernel": kern}}}
                out = fn(p2, ids)
                return kern + (jnp.sum(out) * 1e-20).astype(kern.dtype)

            k2 = jax.lax.fori_loop(0, n, body, params["text"]["proj"]["kernel"])
            return jnp.sum(k2[0])

        float(chain(params, idsj, 2))
        t0 = time.perf_counter()
        float(chain(params, idsj, iters))
        return time.perf_counter() - t0

    enc_t = lambda p, i: jclip.encode_text(p, i, cfg, dtype=jnp.bfloat16)
    dt = timeit_txt(enc_t)
    print(f"text default: {1024*20/dt:,.0f} texts/s")
    for bb in (8, 16):
        def fused(x, p, heads, causal=False, eps=1e-5, act="quick_gelu",
                  fused_sublayer=True, _bb=bb):
            return _pallas_block(x, p, heads, causal, eps, block_b=_bb)

        L.block = fused
        try:
            dt = timeit_txt(enc_t)
            print(f"text fused block (block_b={bb}): {1024*20/dt:,.0f} texts/s")
        except Exception as e:
            print(f"text fused block (block_b={bb}): FAILED {str(e)[:120]}")
        finally:
            L.block = orig_block


if __name__ == "__main__":
    main()
