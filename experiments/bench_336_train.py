"""First ViT-L/14@336 TRAIN measurement (VERDICT r4 #3: "train@336 was
never measured at all").

Geometry: vision S=577 (> _MAX_FLAT_M) so the image tower trains on the
composed XLA path with the r5 pipelined flash fwd kernel + composed VJP;
the text tower keeps its flat Pallas kernels. Memory: the @336 activations
are 2.25x the @224 tower's per image, and the L/14 fp32 train state is the
same 5.1 GB — b16/b32 direct, plus accum variants for a b32-equivalent
global batch where direct execution OOMs (gradient-exact two-pass InfoNCE
accumulation, train/contrastive.py).

Usage: python -u experiments/bench_336_train.py [--iters 4]
"""

import sys
import time

import numpy as np

from _harness import setup, chain_train

setup()

import jax
import jax.numpy as jnp

from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig
from plip_tpu.train.contrastive import (init_train_state, make_optimizer,
                                        make_train_step)

GFLOP_IMG = 381.0       # image fwd
GFLOP_TXT = 14.86 - 8.1  # text share of the @224 pair cost (S=77 unchanged)
PEAK = 197e12


def main():
    iters = (int(sys.argv[sys.argv.index("--iters") + 1])
             if "--iters" in sys.argv else 4)
    cfg = CLIPConfig.vit_l14_336()
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(total_steps=100)
    rng = np.random.default_rng(0)

    # (batch, accum_steps): direct b16/b32; accum to b32/b64-equivalent
    variants = [(16, 1), (32, 1), (32, 2), (64, 4)]
    for batch, accum in variants:
        px = jnp.asarray(
            rng.standard_normal((batch, 336, 336, 3)).astype(np.float32))
        ids_np = np.zeros((batch, 77), np.int32)
        ids_np[:, 0] = 49406
        ids_np[:, 1] = np.arange(batch) % 49000
        ids_np[:, 2] = 49407
        ids = jnp.asarray(ids_np)
        tag = f"b{batch}" + (f"_accum{accum}" if accum > 1 else "")
        try:
            step = make_train_step(cfg, opt, dtype=jnp.bfloat16,
                                   remat=("mlp", "mlp"), accum_steps=accum)
            run = chain_train(step, iters)
            state = init_train_state(params, opt)
            t0 = time.perf_counter()
            state = run(state, px, ids)
            float(state.params["logit_scale"])
            print(f"compiled {tag} in {time.perf_counter()-t0:.0f}s",
                  flush=True)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                state = run(state, px, ids)
                float(state.params["logit_scale"])
                ts.append((time.perf_counter() - t0) / iters)
            best = min(ts)
            # pair FLOPs: image fwd GFLOP_IMG + text ~6.8, x3 for fwd+bwd
            mfu = batch * 3 * (GFLOP_IMG + GFLOP_TXT) * 1e9 / best / PEAK
            print(f"{tag:12s} {best*1e3:8.1f} ms/step  "
                  f"{batch/best:6,.1f} pairs/s  (MFU {mfu*100:.0f}%@3x; "
                  f"all: {', '.join(f'{t*1e3:.1f}' for t in ts)})",
                  flush=True)
            del state
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
