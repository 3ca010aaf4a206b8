"""Decouple dense-M from core waste in the VISION bwd kernels: bb=8/16
with chunk=4 keeps the core dots at today's [200, 200] size while doubling
or quadrupling the dense-matmul row count (B/32 b512 train, one process).

Round-2/3 context: vision bb=8 WHOLE-BLOCK lost 11% — but that point
conflated two effects: dense M=400 (good, bigger MXU tiles) and core
[400, 400] with 7/8 waste (bad, 4x the core FLOPs). chunk=4 at S=50 is
legal ((4*50) % 8 == 0) and separates them: bb=8+chunk4 = dense M=400 with
TWO [200, 200] masked dots per head — exactly the same core FLOPs as
today's bb=4 whole-block [200, 200]. If "smaller blocks pipeline better"
was really core-waste growth in disguise, this point should WIN; if bb=4
still wins, per-program pipelining is the true cause and the bb question
is closed.

Text tower (S=80) keeps its shipped bb=8 + chunk=2 in all variants.
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

_orig_want = A._flat_want
_orig_chunk = A._core_chunk

# (name, vision bb override or None, vision chunk override or None)
VARIANTS = [
    ("base bb4-whole ", None, None),
    ("bb8-chunk4     ", 8, 4),
    ("bb16-chunk4    ", 16, 4),
]


def main():
    batch = 512
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
    for name, vbb, vchunk in VARIANTS:
        step = make_train_step(cfg, opt, dtype=jnp.bfloat16, remat="mlp")

        @jax.jit
        def steps(state, px, ids, n, _step=step):
            def body(_, s):
                s2, _ = _step(s, px, ids)
                return s2
            return jax.lax.fori_loop(0, n, body, state)

        if vbb is not None:
            A._flat_want = lambda S, _bb=vbb: _bb if S == 50 else _orig_want(S)
            A._core_chunk = (lambda S, bb, bwd, _c=vchunk:
                             _c if S == 50 else _orig_chunk(S, bb, bwd))
        try:
            t0 = time.perf_counter()
            float(steps(state, px, ids, 1).params["logit_scale"])
            print(f"compiled {name} in {time.perf_counter()-t0:.0f}s",
                  flush=True)
            runners[name] = steps
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
        finally:
            A._flat_want = _orig_want
            A._core_chunk = _orig_chunk

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
