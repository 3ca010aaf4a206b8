"""A/B the flat-sublayer backward formulation in ONE process:

  fused            — round-2 kernel: dx + dW matmuls + fp32 VMEM accumulators
  dwsplit          — kernel emits (ln, ctx, dqkv); XLA runs dWqkv/dWout
  dwsplit_saveqkv  — dwsplit + forward saves QKV (no recompute matmul)

Motivation (round-3 profiler): XLA's dense bwd ops run at ~90% of peak while
the fused kernel runs at ~60-70%; on top of that the fused kernel's dW
accumulators are a [W, 3W]+[W, W] fp32 read-modify-write per program (~14 MB
of VMEM traffic at W=768) that dwsplit removes entirely. saveqkv additionally
drops the kernel's 2*M*W*3W recompute matmul for +[N, 3W] bf16 residual
memory per layer (+2.9 GB at b512 across both towers).
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

import plip_tpu.ops.attention as A
from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig
from plip_tpu.train.contrastive import (init_train_state, make_optimizer,
                                        make_train_step)

MODES = ["fused", "dwsplit", "dwsplit_saveqkv"]


def main():
    batch = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 512
    cfg = CLIPConfig.vit_b32()
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    opt = make_optimizer(total_steps=100)
    px = jnp.asarray(rng.standard_normal((batch, 224, 224, 3)).astype(np.float32))
    ids_np = np.zeros((batch, 77), np.int32)
    ids_np[:, 0] = 49406
    ids_np[:, 1] = np.arange(batch) % 49000
    ids_np[:, 2] = 49407
    ids = jnp.asarray(ids_np)

    state = init_train_state(params, opt)
    runners = {}
    for mode in MODES:
        step = make_train_step(cfg, opt, dtype=jnp.bfloat16, remat="mlp")

        @jax.jit
        def steps(state, px, ids, n, _step=step):
            def body(_, s):
                s2, _ = _step(s, px, ids)
                return s2
            return jax.lax.fori_loop(0, n, body, state)

        A._BWD_MODE = mode
        try:
            t0 = time.perf_counter()
            float(steps(state, px, ids, 1).params["logit_scale"])
            print(f"compiled {mode} in {time.perf_counter()-t0:.0f}s", flush=True)
            runners[mode] = steps
        except Exception as e:  # e.g. RESOURCE_EXHAUSTED for saveqkv
            print(f"{mode}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        finally:
            A._BWD_MODE = "fused"

    times = {name: [] for name in runners}
    for rnd in range(3):
        for name, steps in runners.items():
            s2 = steps(state, px, ids, 2)
            float(s2.params["logit_scale"])
            t0 = time.perf_counter()
            s3 = steps(s2, px, ids, 10)
            float(s3.params["logit_scale"])
            times[name].append((time.perf_counter() - t0) / 10)
    for name, ts in times.items():
        best = min(ts)
        print(f"{name:16s}: best {best*1e3:7.1f} ms  {batch/best:7,.0f} pairs/s"
              f"  (all: {', '.join(f'{t*1e3:.1f}' for t in ts)})")


if __name__ == "__main__":
    main()
