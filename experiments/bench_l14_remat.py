"""ViT-L/14 per-tower remat A/B in ONE process. The round-3 profiler shows
the b64 image-bwd scan spends 18.2 ms/step in the fc1 recompute
(convolution_add_fusion.11) under remat="mlp"; at L/14 the mlp_h1 policy
(save the fc1 preactivation, recompute only gelu) can afford its +[N, 4W]
bf16 per layer. At B/32 mlp vs mlp_h1 measured EQUAL (XLA hid the
recompute); this checks whether that transfers to L/14's 4x-wider MLP."""

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

POLICIES = [("mlp", "mlp"), ("mlp_h1", "mlp"), (False, "mlp")]


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
    for pol in POLICIES:
        step = make_train_step(cfg, opt, dtype=jnp.bfloat16, remat=pol)

        @jax.jit
        def steps(state, px, ids, n, _step=step):
            def body(_, s):
                s2, _ = _step(s, px, ids)
                return s2
            return jax.lax.fori_loop(0, n, body, state)

        try:
            t0 = time.perf_counter()
            float(steps(state, px, ids, 1).params["logit_scale"])
            print(f"compiled {pol} in {time.perf_counter()-t0:.0f}s", flush=True)
            runners[str(pol)] = steps
        except Exception as e:
            print(f"{pol}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)

    times = {name: [] for name in runners}
    for rnd in range(3):
        for name, steps in runners.items():
            # REBIND one state var: holding state+s2+s3 live = ~15 GB of
            # fp32 L/14 train state and OOMs the chip (donation is not
            # honored through the axon tunnel) — same pattern as
            # bench_l14_hybrid.py / bench_l14_bsweep.py.
            state = steps(state, px, ids, 1)
            float(state.params["logit_scale"])
            t0 = time.perf_counter()
            state = steps(state, px, ids, 5)
            float(state.params["logit_scale"])
            times[name].append((time.perf_counter() - t0) / 5)
    for name, ts in times.items():
        best = min(ts)
        print(f"{name:20s}: best {best*1e3:7.1f} ms  {batch/best:6,.0f} pairs/s"
              f"  (all: {', '.join(f'{t*1e3:.1f}' for t in ts)})")


if __name__ == "__main__":
    main()
