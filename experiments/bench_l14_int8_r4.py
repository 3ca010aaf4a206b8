"""ViT-L/14 W8A8 encode, re-measured on the r4 pipelined attention core.

Round 2 measured W8A8 (composed path, production `layers.linear` dispatch
on `kernel_q`) at 909 img/s vs 799 bf16 — but with the OLD attention core.
The r4 pipelined `_mha_kernel` (deferred softmax divide + cross-head
software pipelining) lifted bf16 to 905 img/s at b64 and is SHARED by the
quantized path (the attention core is never quantized), so the W8A8 dense
2× should now stack on top. This re-measures bf16 vs W8A8 at b64/b128,
interleaved in one process, plus the embedding-cosine accuracy gate.
"""

from _harness import setup, sync, interleave

setup()

import numpy as np
import jax
import jax.numpy as jnp

from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig
from plip_tpu.ops.quant import quantize_block_linears

GFLOP_IMG = 162.4
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
    cfg = CLIPConfig.vit_l14()
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    qparams = {**params,
               "visual": {**params["visual"],
                          "blocks": quantize_block_linears(
                              params["visual"]["blocks"])}}
    rng = np.random.default_rng(0)

    # accuracy gate (production dispatch: layers.linear sees kernel_q)
    px16 = jnp.asarray(rng.standard_normal((16, 224, 224, 3)).astype(np.float32))
    ref = np.asarray(jclip.encode_image(params, px16, cfg, dtype=jnp.bfloat16))
    got = np.asarray(jclip.encode_image(qparams, px16, cfg, dtype=jnp.bfloat16))
    cos = np.sum(ref * got, -1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1))
    print(f"W8A8 embedding cosine vs bf16: min {cos.min():.5f}", flush=True)

    for batch in (64, 128):
        px = jnp.asarray(
            rng.standard_normal((batch, 224, 224, 3)).astype(np.float32))
        iters = 12 if batch == 64 else 8
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
