"""ViT-L/14 W8A8 quantization revisit (VERDICT r1 #9).

Round 1 measured int8 W8A8 *slower* than bf16 at ViT-B/32 (11.5k vs 12.0k
img/s): the dynamic per-row activation-quant VPU work exceeded the MXU
saving at 8.7 GFLOP/img. L/14 is 162 GFLOP/img with 4x-wider matmuls, so the
verdict could flip — this measures it.

Scheme: per-output-channel symmetric int8 weights (pre-quantized outside the
timed loop, as a serving deployment would), dynamic per-row symmetric int8
activations, int32 MXU accumulation, fp32 rescale + bias. Applied to the
four block matmuls (qkv/out/fc1/fc2) via a patched `layers.linear`; patchify
and the final proj stay bf16 (2% of FLOPs). Accuracy gate: embedding cosine
vs bf16 must stay > 0.99 before timing counts."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp

import plip_tpu.models.layers as L
from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig


def quantize_linears(tree):
    """{kernel, bias} -> {kernel_q int8, wscale, bias} for every linear in
    the block stack (leading layer axis preserved)."""
    if isinstance(tree, dict):
        if "kernel" in tree and tree["kernel"].ndim >= 2:
            w = tree["kernel"]
            wscale = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0
            wq = jnp.round(w / wscale).astype(jnp.int8)
            out = {"kernel_q": wq, "wscale": wscale}
            if "bias" in tree:
                out["bias"] = tree["bias"]
            return out
        return {k: quantize_linears(v) for k, v in tree.items()}
    return tree


def linear_int8(x, p):
    if "kernel_q" not in p:
        return _orig_linear(x, p)
    ascale = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0
    ascale = jnp.maximum(ascale, 1e-8)
    xq = jnp.round(x.astype(jnp.float32) / ascale).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, p["kernel_q"],
        dimension_numbers=(((x.ndim - 1,), (p["kernel_q"].ndim - 2,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = y * ascale * p["wscale"].reshape(1, -1)
    if "bias" in p:
        y = y + p["bias"]
    return y.astype(x.dtype)


_orig_linear = L.linear


def timeit(fn, params, px, iters=20):
    @jax.jit
    def chain(params, px, n):
        def body(_, p):
            out = fn(params, p)
            return p + (jnp.sum(out) * 1e-20).astype(p.dtype)

        px2 = jax.lax.fori_loop(0, n, body, px)
        return jnp.sum(px2[0, 0, 0])

    float(chain(params, px, 2))
    t0 = time.perf_counter()
    float(chain(params, px, iters))
    return (time.perf_counter() - t0) / iters


def main():
    cfg = CLIPConfig.vit_l14()
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = 128
    px = jnp.asarray(rng.standard_normal((batch, 224, 224, 3)).astype(np.float32))
    gflop_img = 162.4

    enc = lambda p, x: jclip.encode_image(p, x, cfg, dtype=jnp.bfloat16)

    ref = np.asarray(enc(params, px[:16]))
    qparams = {**params,
               "visual": {**params["visual"],
                          "blocks": quantize_linears(params["visual"]["blocks"])}}
    L.linear = linear_int8
    try:
        got = np.asarray(enc(qparams, px[:16]))
        cos = np.sum(ref * got, -1) / (
            np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1))
        print(f"int8 embedding cosine vs bf16: min {cos.min():.5f}")
        dt_q = timeit(enc, qparams, px)
    finally:
        L.linear = _orig_linear

    dt = timeit(enc, params, px)
    print(f"bf16: {batch/dt:6,.0f} img/s ({dt*1e3:.1f} ms, "
          f"{batch*gflop_img*1e9/dt/197e12*100:.0f}% MFU)")
    print(f"int8 W8A8 blocks: {batch/dt_q:6,.0f} img/s ({dt_q*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
