"""ViT-L/14 b64 train A/B in ONE process: {flat fused fwd, hybrid composed
fwd} x {remat mlp, mlp_h1} — all with the flat Pallas backward kernel.

Motivation (round-3 profiler): the L/14 image fwd sublayer kernel runs 1.52
ms/layer (~53% of floor) while the composed path's XLA dense ops run ~90%;
forward-only encode already prefers composed at W=1024 (75.6 vs 77.5 ms).
The custom-VJP boundary makes the pass choice independent
(`_TRAIN_FWD_COMPOSED_OVERRIDE`).

Harness note: a 428M-param L/14 train state is 5.1 GB fp32 (params + two
AdamW moments); keeping three of them live (state, s2, s3) OOMs the chip —
donation is not honored through the axon tunnel. The timed loop therefore
REBINDS one state var so old buffers free as it goes."""

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

# mlp_h1 at L/14 b64 OOMs (confirmed twice: +3.3 GB of [N, 4W] fc1
# preacts on top of the 5.1 GB fp32 train state does not fit) — only the
# fitting remat='mlp' variants are timed.
VARIANTS = [
    ("flat/mlp  ", False, "mlp"),
    ("hybrid/mlp", True, "mlp"),
]


def main():
    batch = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 64
    cfg = CLIPConfig.vit_l14()
    params = jclip.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    opt = make_optimizer(total_steps=100)
    px = jnp.asarray(rng.standard_normal((batch, 224, 224, 3)).astype(np.float32))
    ids_np = np.zeros((batch, 77), np.int32)
    ids_np[:, 0] = 49406
    ids_np[:, 1] = np.arange(batch) % 49000
    ids_np[:, 2] = 49407
    ids = jnp.asarray(ids_np)

    state = init_train_state(params, opt)
    runners = {}
    for name, hybrid, pol in VARIANTS:
        step = make_train_step(cfg, opt, dtype=jnp.bfloat16,
                               remat=(pol, "mlp"))

        @jax.jit
        def steps(state, px, ids, n, _step=step):
            def body(_, s):
                s2, _ = _step(s, px, ids)
                return s2
            return jax.lax.fori_loop(0, n, body, state)

        A._TRAIN_FWD_COMPOSED_OVERRIDE = hybrid
        try:
            t0 = time.perf_counter()
            state = steps(state, px, ids, 1)
            float(state.params["logit_scale"])
            print(f"compiled {name} in {time.perf_counter()-t0:.0f}s",
                  flush=True)
            runners[name] = steps
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            state = init_train_state(params, opt)
        finally:
            A._TRAIN_FWD_COMPOSED_OVERRIDE = None

    times = {name: [] for name in runners}
    for rnd in range(3):
        for name, steps in runners.items():
            state = steps(state, px, ids, 1)
            float(state.params["logit_scale"])
            t0 = time.perf_counter()
            state = steps(state, px, ids, 5)
            float(state.params["logit_scale"])
            times[name].append((time.perf_counter() - t0) / 5)
    for name, ts in times.items():
        best = min(ts)
        print(f"{name}: best {best*1e3:7.1f} ms  {batch/best:6,.0f} pairs/s"
              f"  (all: {', '.join(f'{t*1e3:.1f}' for t in ts)})")


if __name__ == "__main__":
    main()
