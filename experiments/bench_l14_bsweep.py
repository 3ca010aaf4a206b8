"""ViT-L/14 hybrid-train batch sweep in ONE process: b64 / b96 / b128.

Motivation: at b64 the step's fixed costs (patchify/proj/loss + AdamW over
428M fp32 params ~ 25.7 ms of 327.9, round-3 profile) are ~8% of the step;
doubling batch amortizes them and feeds the bwd kernels larger M. Memory
budget: 5.1 GB fp32 train state + ~1.7 GB grads + remat='mlp' residuals
(~0.9 GB/b64) — b128 should still fit the 16 GB chip.

All variants: hybrid composed fwd + flat Pallas bwd, remat='mlp' (the only
fitting policy at L/14). One process, interleaved rounds, best-of-3.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from plip_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache("/root/repo/.jax_cache")

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

import plip_tpu.ops.attention as A
from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig
from plip_tpu.train.contrastive import (init_train_state, make_optimizer,
                                        make_train_step)

BATCHES = [64, 96, 128]


def main():
    cfg = CLIPConfig.vit_l14()
    params = jclip.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    opt = make_optimizer(total_steps=100)
    state = init_train_state(params, opt)

    data = {}
    for b in BATCHES:
        px = jnp.asarray(rng.standard_normal((b, 224, 224, 3)).astype(np.float32))
        ids_np = np.zeros((b, 77), np.int32)
        ids_np[:, 0] = 49406
        ids_np[:, 1] = np.arange(b) % 49000
        ids_np[:, 2] = 49407
        data[b] = (px, jnp.asarray(ids_np))

    step = make_train_step(cfg, opt, dtype=jnp.bfloat16, remat=("mlp", "mlp"))

    # Donate the 5.1 GB fp32 train state: without donation input+output
    # states coexist across a call (10.2 GB) and b>=96 OOMs before the
    # model's own working set is even counted.
    @partial(jax.jit, donate_argnums=(0,))
    def steps(state, px, ids, n):
        def body(_, s):
            s2, _ = step(s, px, ids)
            return s2
        return jax.lax.fori_loop(0, n, body, state)

    A._TRAIN_FWD_COMPOSED_OVERRIDE = True
    try:
        for b in BATCHES:
            px, ids = data[b]
            try:
                t0 = time.perf_counter()
                state = steps(state, px, ids, 1)
                float(state.params["logit_scale"])
                print(f"compiled b{b} in {time.perf_counter()-t0:.0f}s",
                      flush=True)
                ts = []
                for _ in range(3):
                    state = steps(state, px, ids, 1)
                    float(state.params["logit_scale"])
                    t0 = time.perf_counter()
                    state = steps(state, px, ids, 5)
                    float(state.params["logit_scale"])
                    ts.append((time.perf_counter() - t0) / 5)
                best = min(ts)
                print(f"b{b}: best {best*1e3:7.1f} ms  {b/best:6,.0f} pairs/s"
                      f"  (all: {', '.join(f'{t*1e3:.1f}' for t in ts)})",
                      flush=True)
            except Exception as e:
                print(f"b{b}: FAILED {type(e).__name__}: {str(e)[:200]}",
                      flush=True)
                state = None
                state = init_train_state(params, opt)
    finally:
        A._TRAIN_FWD_COMPOSED_OVERRIDE = None


if __name__ == "__main__":
    main()
