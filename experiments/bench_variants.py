"""Perf experiments on the real chip: encode-path variants."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp

from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig


def timeit(fn, *args, iters=20):
    # chain iterations; single scalar fetch (axon defers until host read)
    @jax.jit
    def chain(params, px, n):
        def body(_, p):
            out = fn(params, p)
            return p + (jnp.sum(out) * 1e-20).astype(p.dtype)

        px2 = jax.lax.fori_loop(0, n, body, px)
        return jnp.sum(px2[0, 0, 0])

    params, px = args
    float(chain(params, px, 2))
    t0 = time.perf_counter()
    float(chain(params, px, iters))
    return time.perf_counter() - t0


def main():
    cfg = CLIPConfig.vit_b32()
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)

    for batch in (256, 512):
        px = jnp.asarray(rng.standard_normal((batch, 224, 224, 3)).astype(np.float32))
        iters = 20

        # v1: fp32 params, bf16 compute (current bench path)
        dt = timeit(lambda p, x: jclip.encode_image(p, x, cfg, dtype=jnp.bfloat16),
                    params, px, iters=iters)
        print(f"batch={batch} v1 fp32-params/bf16: {batch*iters/dt:.0f} img/s")

        # v2: params pre-cast to bf16
        bf16_params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
        )
        dt = timeit(lambda p, x: jclip.encode_image(p, x, cfg, dtype=jnp.bfloat16),
                    bf16_params, px, iters=iters)
        print(f"batch={batch} v2 bf16-params/bf16: {batch*iters/dt:.0f} img/s")

        # v3: bf16 input pixels as well (halves H2D + patchify read)
        px16 = px.astype(jnp.bfloat16)
        dt = timeit(lambda p, x: jclip.encode_image(p, x, cfg, dtype=jnp.bfloat16),
                    bf16_params, px16, iters=iters)
        print(f"batch={batch} v3 all-bf16: {batch*iters/dt:.0f} img/s")

        # v4: fp32 everything (baseline numerics)
        dt = timeit(lambda p, x: jclip.encode_image(p, x, cfg, dtype=jnp.float32),
                    params, px, iters=iters)
        print(f"batch={batch} v4 fp32: {batch*iters/dt:.0f} img/s")


if __name__ == "__main__":
    main()
