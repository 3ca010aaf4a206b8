"""L/14@336 encode sweep on the r5 pipelined flash core: bf16 + W8A8.

The r5 pipelined S>512 flash kernel (ops/attention.py `_flash_kernel`
pipeline=True, hpp=16) cut the in-scan attention time 40.2 -> 11.9 ms/batch
at b32; this re-establishes (a) the bf16 batch optimum (was b32 pre-change),
(b) the W8A8 numbers (r4 lesson: re-measure quantized paths after ANY core
change — the quantized dense win stacks on the shared attention core), and
(c) the MFU column for PERF.md's @336 row. One process, interleaved.

GFLOP/img at 336px = 381 (S=577, W=1024, 24 layers; same accounting as the
r4 VERDICT: 296 img/s = 113 TF/s = 57% of the 197 TF/s v5e bf16 peak).
"""

import numpy as np

from _harness import setup, sync, interleave

setup()

import jax
import jax.numpy as jnp

from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig
from plip_tpu.ops.quant import quantize_block_linears

GFLOP_IMG = 381.0
PEAK = 197e12


def chained_encode(cfg, params, px, iters):
    @jax.jit
    def run(p, x):
        def body(_, xc):
            out = jclip.encode_image(p, xc, cfg, dtype=jnp.bfloat16)
            return xc + (jnp.sum(out) * 1e-20).astype(xc.dtype)
        x2 = jax.lax.fori_loop(0, iters, body, x)
        return jnp.sum(x2[0, 0, 0])
    return lambda: sync(run(params, px))


def main():
    cfg = CLIPConfig.vit_l14_336()
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    qparams = {**params,
               "visual": {**params["visual"],
                          "blocks": quantize_block_linears(
                              params["visual"]["blocks"])}}
    rng = np.random.default_rng(0)

    px8 = jnp.asarray(rng.standard_normal((8, 336, 336, 3)).astype(np.float32))
    ref = np.asarray(jclip.encode_image(params, px8, cfg, dtype=jnp.bfloat16))
    got = np.asarray(jclip.encode_image(qparams, px8, cfg, dtype=jnp.bfloat16))
    cos = np.sum(ref * got, -1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1))
    print(f"W8A8 embedding cosine vs bf16: min {cos.min():.5f}", flush=True)

    for batch in (16, 32, 64):
        px = jnp.asarray(
            rng.standard_normal((batch, 336, 336, 3)).astype(np.float32))
        iters = max(4, 128 // batch)
        best, _ = interleave({
            "bf16": chained_encode(cfg, params, px, iters),
            "w8a8": chained_encode(cfg, qparams, px, iters),
        }, rounds=3)
        for name, t in best.items():
            dt = t / iters
            print(f"b{batch} {name}: {batch/dt:6,.0f} img/s ({dt*1e3:6.1f} ms,"
                  f" {batch*GFLOP_IMG*1e9/dt/PEAK*100:.0f}% MFU@bf16-peak)",
                  flush=True)


if __name__ == "__main__":
    main()
