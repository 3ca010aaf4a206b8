"""Whole-block backward kernel (ops/block_bwd.py) in the full train step:
remat="block" vs the round-2 champion remat="mlp", plus a block_b sweep.

Usage:
  python -u experiments/bench_block_bwd.py --batch 512          # step compare
  python -u experiments/bench_block_bwd.py --batch 512 --sweep  # bb sweep
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from plip_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache("/root/repo/.jax_cache")

import time

import numpy as np

import jax
import jax.numpy as jnp

from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig
from plip_tpu.train.contrastive import (init_train_state, make_optimizer,
                                        make_train_step)

PEAK_BF16 = 197e12
GFL_PAIR = 14.86


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


def sweep_kernel(batch):
    """Isolated 12-layer image-tower backward: block_b sweep."""
    from plip_tpu.models.layers import init_block_stack
    from plip_tpu.ops.block_bwd import _pallas_block_bwd_flat

    W, L, heads, S = 768, 12, 12, 50
    stacked = jax.tree.map(
        lambda a: a.astype(jnp.float32),
        init_block_stack(jax.random.PRNGKey(0), L, W))
    rng = np.random.default_rng(0)
    N = batch * S
    x = jnp.asarray(rng.standard_normal((N, W)), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((N, W)), jnp.bfloat16)

    for bb in (2, 4, 8, 16):
        if batch % bb:
            continue

        @jax.jit
        def stack_bwd(x, g, stacked):
            def body(carry, p):
                gx, px = carry
                dx, _ = _pallas_block_bwd_flat(
                    px, gx, p, S, heads, False, 1e-5, block_b=bb)
                return (dx, px + jnp.sum(dx) * 1e-20), None

            (gx, _), _ = jax.lax.scan(body, (g, x), stacked)
            return gx

        try:
            out = stack_bwd(x, g, stacked)
            float(jnp.sum(out))
            t0 = time.perf_counter()
            out = stack_bwd(x, g, stacked)
            float(jnp.sum(out))
            dt = time.perf_counter() - t0
            print(f"bb={bb:2d}: {dt*1e3:7.1f} ms / 12-layer bwd stack")
        except Exception as e:
            print(f"bb={bb:2d}: FAILED {type(e).__name__}: {str(e)[:160]}")


def main():
    batch = (int(sys.argv[sys.argv.index("--batch") + 1])
             if "--batch" in sys.argv else 512)
    if "--sweep" in sys.argv:
        sweep_kernel(batch)
        return

    cfg = CLIPConfig.vit_b32()
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    opt = make_optimizer(total_steps=100)
    px = jnp.asarray(
        rng.standard_normal((batch, 224, 224, 3)).astype(np.float32))
    ids_np = np.zeros((batch, 77), np.int32)
    ids_np[:, 0] = 49406
    ids_np[:, 1] = np.arange(batch) % 49000
    ids_np[:, 2] = 49407
    ids = jnp.asarray(ids_np)

    if "--combos" in sys.argv:
        remats = (("block", "mlp"), ("mlp", "block"), "block", "mlp")
    elif "--both" in sys.argv:
        remats = ("block", "mlp")
    else:
        remats = ("block",)
    for remat in remats:
        try:
            step = make_train_step(cfg, opt, dtype=jnp.bfloat16, remat=remat)
            state = init_train_state(params, opt)
            dt = run(step, state, px, ids)
            print(f"b={batch} remat={remat!s:18s}: {dt*1e3:7.1f} ms "
                  f"{batch/dt:7,.0f} pairs/s "
                  f"(MFU {batch*3*GFL_PAIR*1e9/dt/PEAK_BF16*100:.0f}%@3x)")
            del state
        except Exception as e:
            print(f"b={batch} remat={remat}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
