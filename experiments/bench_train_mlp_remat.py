"""Full train step: remat=True (whole-block) vs remat="mlp" (MLP-half only).

Motivation (bench_train_decomp): no-remat grads beat remat (2,241 vs 2,089
pairs/s at b256) but the full step OOMs; the fused attention sublayer's
custom VJP saves only its input, so checkpointing just the MLP half should
recover most of the no-remat win at ~2×[B,S,W]/layer footprint."""

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
GFL_PAIR = 14.86  # bench_train_decomp accounting


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
    rng = np.random.default_rng(0)
    opt = make_optimizer(total_steps=100)

    batches = ((int(sys.argv[sys.argv.index("--batch") + 1]),)
               if "--batch" in sys.argv else (256, 512, 1024))
    for batch in batches:
        px = jnp.asarray(
            rng.standard_normal((batch, 224, 224, 3)).astype(np.float32))
        ids_np = np.zeros((batch, 77), np.int32)
        ids_np[:, 0] = 49406
        ids_np[:, 1] = np.arange(batch) % 49000
        ids_np[:, 2] = 49407
        ids = jnp.asarray(ids_np)

        for remat in (True, "mlp"):
            try:
                step = make_train_step(cfg, opt, dtype=jnp.bfloat16,
                                       remat=remat)
                state = init_train_state(params, opt)
                dt = run(step, state, px, ids)
                print(f"b={batch} remat={remat!s:5s}: {dt*1e3:7.1f} ms "
                      f"{batch/dt:7,.0f} pairs/s "
                      f"(MFU {batch*3*GFL_PAIR*1e9/dt/PEAK_BF16*100:.0f}%@3x)")
                del state
            except Exception as e:
                print(f"b={batch} remat={remat}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}")


if __name__ == "__main__":
    main()
