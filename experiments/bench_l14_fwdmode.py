"""L/14 train: hybrid (composed fwd) vs all-flat fwd, b96 — revisited in r4
because the flat fwd core is now pipelined (it was the serialized loser that
motivated the hybrid in r3). One process."""

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
    for name, ov in (("hybrid", True), ("allflat", False)):
        attention._TRAIN_FWD_COMPOSED_OVERRIDE = ov
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
        print(f"compiled {name} in {time.perf_counter()-t0:.0f}s", flush=True)
        runners[name] = steps
    attention._TRAIN_FWD_COMPOSED_OVERRIDE = None

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
