"""L/14 b96 train: _BWD_MODE fused vs dwsplit (one process).

The r4 b96 profile puts the image-bwd flat kernel at 132 ms/step (56% of its
~74 ms FLOP floor); dWqkv+dWout are ~213 GF/layer of that kernel's serial
stream. dwsplit moves them to XLA dot+DUS fusions (measured ~90% of peak in
the same profile) that can overlap the kernel. Neutral at B/32 (r3) where dW
is a smaller share — L/14 was never measured.
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

from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig
from plip_tpu.ops import attention
from plip_tpu.train.contrastive import (init_train_state, make_optimizer,
                                        make_train_step)


def main():
    batch = (int(sys.argv[sys.argv.index("--batch") + 1])
             if "--batch" in sys.argv else 96)
    cfg = CLIPConfig.vit_l14()
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    opt = make_optimizer(total_steps=100)
    px = jnp.asarray(rng.standard_normal((batch, 224, 224, 3)).astype(np.float32))
    ids_np = np.zeros((batch, 77), np.int32)
    ids_np[:, 0] = 49406
    ids_np[:, 1] = np.arange(batch) % 49000
    ids_np[:, 2] = 49407
    ids = jnp.asarray(ids_np)

    runners = {}
    state = init_train_state(params, opt)
    for mode in ("fused", "dwsplit"):
        attention._BWD_MODE = mode
        step = make_train_step(cfg, opt, dtype=jnp.bfloat16, remat="mlp")

        @partial(jax.jit, donate_argnums=(0,))
        def steps(state, px, ids, n, _step=step):
            def body(_, s):
                s2, _ = _step(s, px, ids)
                return s2
            return jax.lax.fori_loop(0, n, body, state)

        t0 = time.perf_counter()
        state = steps(state, px, ids, 1)
        float(state.params["logit_scale"])
        print(f"compiled {mode} in {time.perf_counter()-t0:.0f}s", flush=True)
        runners[mode] = steps
    attention._BWD_MODE = "fused"

    times = {name: [] for name in runners}
    for rnd in range(3):
        for name, steps in runners.items():
            state = steps(state, px, ids, 1)
            float(state.params["logit_scale"])
            t0 = time.perf_counter()
            state = steps(state, px, ids, 8)
            float(state.params["logit_scale"])
            times[name].append((time.perf_counter() - t0) / 8)
    for name, ts in times.items():
        best = min(ts)
        print(f"{name:8s}: best {best*1e3:7.1f} ms  {batch/best:7,.0f} "
              f"pairs/s  (all: {', '.join(f'{t*1e3:.1f}' for t in ts)})",
              flush=True)


if __name__ == "__main__":
    main()
