"""VERDICT r3 #2 — the deliberate cross-sublayer backward-schedule attack at
ViT-B/32 b512: {fused, dwsplit} backward x {scan unroll 1, 2}, one process.

Hypothesis: dwsplit alone was neutral (r3) because the kernel-emitted dW
matmuls sit AFTER the attn-bwd kernel inside one scan iteration with nothing
to overlap; unroll=2 puts two layers in one XLA block so layer l's XLA dW
dots can run during layer l+1's attn-bwd Pallas kernel.
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

from plip_tpu.models import clip as jclip, layers
from plip_tpu.models.config import CLIPConfig
from plip_tpu.ops import attention
from plip_tpu.train.contrastive import (init_train_state, make_optimizer,
                                        make_train_step)

CONFIGS = [
    ("fused_u1", "fused", 1),
    ("fused_u2", "fused", 2),
    ("dwsplit_u1", "dwsplit", 1),
    ("dwsplit_u2", "dwsplit", 2),
    ("dwsplit_u3", "dwsplit", 3),
]


def main():
    batch = (int(sys.argv[sys.argv.index("--batch") + 1])
             if "--batch" in sys.argv else 512)
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

    runners = {}
    for name, mode, unroll in CONFIGS:
        # trace-time policies: set before the step fn is traced
        attention._BWD_MODE = mode
        layers._SCAN_UNROLL = unroll
        step = make_train_step(cfg, opt, dtype=jnp.bfloat16, remat="mlp")

        @jax.jit
        def steps(state, px, ids, n, _step=step):
            def body(_, s):
                s2, _ = _step(s, px, ids)
                return s2
            return jax.lax.fori_loop(0, n, body, state)

        state0 = init_train_state(jax.tree.map(jnp.copy, params), opt)
        t0 = time.perf_counter()
        float(steps(state0, px, ids, 1).params["logit_scale"])
        print(f"compiled {name} in {time.perf_counter()-t0:.0f}s", flush=True)
        runners[name] = steps
    attention._BWD_MODE = "fused"
    layers._SCAN_UNROLL = 1

    state = init_train_state(params, opt)
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
        print(f"{name:12s}: best {best*1e3:7.1f} ms  {batch/best:7,.0f} "
              f"pairs/s  (all: {', '.join(f'{t*1e3:.1f}' for t in ts)})")


if __name__ == "__main__":
    main()
