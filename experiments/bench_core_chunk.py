"""A/B the CHUNKED core formulation (_core_chunk) for the text tower's
S=80 sublayer kernels in the B/32 b512 train step, ONE process.

Round-3 context: the row-blocked core (chunk=1, 4 exact [80, 80] dots)
measured neutral-to-worse vs whole-block block-diag ([320, 320], 3/4
masked) — killing 87.5%% of core waste lost to small-dot serialization.
chunk=2 is the untested middle ground: 2 masked [160, 160] dots per head,
waste 1/2 — kills a third of the core FLOPs while keeping dots MXU-sized.
The image tower (S=50, not 8-alignable) keeps whole-block under any
override, so this isolates the text kernels.

The override is read at TRACE time; each variant compiles its own step.
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

# (name, fwd_chunk, bwd_chunk); False = whole-block block-diag
VARIANTS = [
    ("base-whole ", False, False),
    ("chunk2-bwd ", False, 2),
    ("chunk2-both", 2, 2),
]


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
    for name, f, b in VARIANTS:
        step = make_train_step(cfg, opt, dtype=jnp.bfloat16, remat="mlp")

        @jax.jit
        def steps(state, px, ids, n, _step=step):
            def body(_, s):
                s2, _ = _step(s, px, ids)
                return s2
            return jax.lax.fori_loop(0, n, body, state)

        A._ROW_CORE_OVERRIDE = {"fwd": f, "bwd": b}
        try:
            t0 = time.perf_counter()
            float(steps(state, px, ids, 1).params["logit_scale"])
            print(f"compiled {name} in {time.perf_counter()-t0:.0f}s", flush=True)
        finally:
            A._ROW_CORE_OVERRIDE = None
        runners[name] = steps

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
        print(f"{name}: best {best*1e3:7.1f} ms  {batch/best:7,.0f} pairs/s"
              f"  (all: {', '.join(f'{t*1e3:.1f}' for t in ts)})")


if __name__ == "__main__":
    main()
