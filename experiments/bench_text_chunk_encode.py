"""Fwd-only encode_text A/B: whole-block vs the new chunk=2 default core.

The chunk=2 S<=128 default was measured as a TRAIN-step win (+1.4% b512,
bench_core_chunk.py) where the forward runs twice per step; encode_text
(zero-shot / retrieval eval path) is a different regime — fwd-only, often
small batch. This pins that the default doesn't regress it (and by how
much it helps, if it does). Chains through token_embed (NOT the final
proj — XLA hoists the tower otherwise; see bench_text_pad.py).
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

VARIANTS = [("whole-block", False), ("chunk2     ", 2)]
BATCH = 1024


def main():
    cfg = CLIPConfig.vit_b32()
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids_np = np.zeros((BATCH, 77), np.int32)
    ids_np[:, 0] = 49406
    ids_np[:, 1] = rng.integers(1, 49000, BATCH)
    ids_np[:, 2] = 49407
    ids = jnp.asarray(ids_np)

    runners = {}
    for name, c in VARIANTS:
        @jax.jit
        def chain(params, ids, n):
            def body(_, tok):
                p2 = {**params, "text": {**params["text"], "token_embed": tok}}
                out = jclip.encode_text(p2, ids, cfg, dtype=jnp.bfloat16)
                return tok + (jnp.sum(out) * 1e-20).astype(tok.dtype)

            t2 = jax.lax.fori_loop(0, n, body, params["text"]["token_embed"])
            return jnp.sum(t2[0])

        A._ROW_CORE_OVERRIDE = {"fwd": c, "bwd": c}
        try:
            t0 = time.perf_counter()
            float(chain(params, ids, 1))
            print(f"compiled {name} in {time.perf_counter()-t0:.0f}s",
                  flush=True)
        finally:
            A._ROW_CORE_OVERRIDE = None
        runners[name] = chain

    times = {name: [] for name in runners}
    for rnd in range(3):
        for name, chain in runners.items():
            float(chain(params, ids, 2))
            t0 = time.perf_counter()
            float(chain(params, ids, 20))
            times[name].append((time.perf_counter() - t0) / 20)
    for name, ts in times.items():
        best = min(ts)
        print(f"{name}: best {best*1e3:6.2f} ms  {BATCH/best:9,.0f} texts/s"
              f"  (all: {', '.join(f'{t*1e3:.2f}' for t in ts)})")


if __name__ == "__main__":
    main()
