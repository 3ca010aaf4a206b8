"""In-process block_b sweep for the ViT-B/32 TRAIN step (b512, remat='mlp').

Round-2 fixed block_b=4 from FORWARD sweeps; the backward kernel's optimum
was never swept independently. Larger bb amortizes the per-program VPU
phases (two LN backwards, softmax backward) over more MXU rows — the
backward is the 50%-MFU wall, so its optimum may differ from the forward's.

All variants compiled up front, timed interleaved (one process — the tunnel
has ~8% cross-process variance).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from plip_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache("/root/repo/.jax_cache")

import numpy as np

import jax
import jax.numpy as jnp

import plip_tpu.ops.attention as A
from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig
from plip_tpu.train.contrastive import (init_train_state, make_optimizer,
                                        make_train_step)

_orig_want = A._flat_want


def main():
    batch = 512
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    cfg = CLIPConfig.vit_b32()
    params = jclip.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    px = jnp.asarray(
        rng.standard_normal((batch, 224, 224, 3)).astype(np.float32))
    ids_np = np.zeros((batch, 77), np.int32)
    ids_np[:, 0] = 49406
    ids_np[:, 1] = np.arange(batch) % 49000
    ids_np[:, 2] = 49407
    ids = jnp.asarray(ids_np)
    opt = make_optimizer(total_steps=100)

    state0 = init_train_state(params, opt)
    runners = {}
    for bb in (4, 8, 16):
        step = make_train_step(cfg, opt, dtype=jnp.bfloat16, remat="mlp")

        @jax.jit
        def steps(state, px, ids, n, _step=step):
            def body(_, s):
                s2, _ = _step(s, px, ids)
                return s2
            return jax.lax.fori_loop(0, n, body, state)

        A._flat_want = lambda S, _bb=bb: _bb
        t0 = time.perf_counter()
        s2 = steps(state0, px, ids, 1)
        float(s2.params["logit_scale"])
        del s2
        A._flat_want = _orig_want
        print(f"  compiled bb={bb} in {time.perf_counter()-t0:.0f}s",
              flush=True)
        runners[bb] = steps

    times = {bb: [] for bb in runners}
    s = state0
    for _ in range(3):
        for bb, steps in runners.items():
            s = steps(s, px, ids, 2)
            float(s.params["logit_scale"])
            t0 = time.perf_counter()
            s = steps(s, px, ids, 10)
            float(s.params["logit_scale"])
            times[bb].append((time.perf_counter() - t0) / 10)
    for bb, ts in times.items():
        best = min(ts)
        print(f"train b{batch} bb={bb:2d}: best {best*1e3:7.1f} ms  "
              f"{batch/best:6,.0f} pairs/s  "
              f"(all: {', '.join(f'{t*1e3:.1f}' for t in ts)})", flush=True)


if __name__ == "__main__":
    main()
