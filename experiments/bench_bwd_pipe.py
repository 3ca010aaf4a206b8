"""A/B the pipelined + deferred-divide backward core (_core_fwd_bwd_block,
_PIPE_BWD_OVERRIDE) in full train steps, one process:

- ViT-L/14 b96 (hybrid fwd + flat Pallas bwd, remat="mlp"): pipeline is the
  S>128 default — measure ON vs OFF.
- ViT-B/32 b512: S = 50/80 <= 128 keeps the bit-exact schedule by default —
  measure whether forcing the pipelined schedule wins there too.

Usage: python bench_bwd_pipe.py [--model l14|b32]
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
from plip_tpu.ops import attention
from plip_tpu.train.contrastive import (init_train_state, make_optimizer,
                                        make_train_step)


def bench(cfg, batch, pipe_values):
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    opt = make_optimizer(total_steps=100)
    px = jnp.asarray(rng.standard_normal((batch, 224, 224, 3)).astype(np.float32))
    ids_np = np.zeros((batch, 77), np.int32)
    ids_np[:, 0] = 49406
    ids_np[:, 1] = np.arange(batch) % 49000
    ids_np[:, 2] = 49407
    ids = jnp.asarray(ids_np)

    from functools import partial

    runners = {}
    state = init_train_state(params, opt)
    for pv in pipe_values:
        # the override is read at TRACE time of the custom-VJP backward, so
        # the first (compiling) call MUST happen while it is set — creating
        # all runners first and compiling later traces them all with the
        # final override value (the r4 bug that produced identical times)
        attention._PIPE_BWD_OVERRIDE = pv
        step = make_train_step(cfg, opt, dtype=jnp.bfloat16, remat="mlp")

        # donate the fp32 train state (5.1 GB at L/14 — input+output
        # coexisting OOMs b>=96, bench_l14_bsweep pattern); the state is
        # threaded through every call below
        @partial(jax.jit, donate_argnums=(0,))
        def steps(state, px, ids, n, _step=step):
            def body(_, s):
                s2, _ = _step(s, px, ids)
                return s2
            return jax.lax.fori_loop(0, n, body, state)

        t0 = time.perf_counter()
        state = steps(state, px, ids, 1)
        float(state.params["logit_scale"])
        print(f"compiled pipe={pv} in {time.perf_counter()-t0:.0f}s",
              flush=True)
        runners[str(pv)] = steps
    attention._PIPE_BWD_OVERRIDE = None
    times = {name: [] for name in runners}
    for rnd in range(3):
        for name, steps in runners.items():
            state = steps(state, px, ids, 1)  # warm re-entry
            float(state.params["logit_scale"])
            t0 = time.perf_counter()
            state = steps(state, px, ids, 8)
            float(state.params["logit_scale"])
            times[name].append((time.perf_counter() - t0) / 8)
    for name, ts in times.items():
        best = min(ts)
        print(f"pipe={name:5s}: best {best*1e3:7.1f} ms  {batch/best:7,.0f} "
              f"pairs/s  (all: {', '.join(f'{t*1e3:.1f}' for t in ts)})",
              flush=True)


def main():
    model = (sys.argv[sys.argv.index("--model") + 1]
             if "--model" in sys.argv else "l14")
    if model == "l14":
        print("== ViT-L/14 b96 hybrid train (pipeline default ON at S=264) ==")
        bench(CLIPConfig.vit_l14(), 96, [None, False])
    else:
        print("== ViT-B/32 b512 train (pipeline default OFF at S<=128) ==")
        bench(CLIPConfig.vit_b32(), 512, [None, True])


if __name__ == "__main__":
    main()
