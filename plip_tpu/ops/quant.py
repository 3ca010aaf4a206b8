"""W8A8 int8 inference quantization for transformer-block linears.

Measured on v5e (PERF.md): per-output-channel int8 weights + dynamic
per-row int8 activations with int32 MXU accumulation are

- ViT-L/14 (162 GFLOP/img): 909 vs 799 img/s — **+14%**, embedding cosine
  vs bf16 ≥ 0.9998 → worth it, exposed here;
- ViT-B/32 (8.7 GFLOP/img): 11.5k vs 13.3k img/s — *slower* (the dynamic
  activation-quant VPU work exceeds the MXU saving at that size) → not used.

Inference-only: quantized params are a frozen transform of the fp32 tree
(`quantize_block_linears`), and `layers.linear` dispatches on the presence
of ``kernel_q``. The fused attention-sublayer kernel does not consume
quantized params (its gate requires a plain ``kernel`` leaf, so int8 towers
always run the composed path whose `linear` dispatches to W8A8) — the API
therefore quantizes only the VISUAL blocks at L/14, where the +14% was
measured on the composed S=257 tower. The L/14 TEXT tower (S=77) stays
bf16 on the fused kernel — quantizing it would move encode_text onto
composed W8A8, whose speed vs the fused bf16 kernel is unmeasured, for a
tower holding a tiny share of total FLOPs. NB since round 3 the bf16 L/14
image tower can take the fused path too (padded S=264, ops/attention
`_flat_pallas_ok`); quantize='w8a8' remains a composed-path trade.

Replaces nothing in the reference (it has no quantized path — this is part
of "beat on perf", SURVEY.md §6).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def quantize_linear(p: Params) -> Params:
    """{kernel, bias?} -> {kernel_q int8, wscale, bias?}.

    Symmetric per-output-channel scales over the input axis (axis=-2 so a
    leading layer-stack axis is preserved)."""
    w = p["kernel"]
    wscale = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0
    wscale = jnp.maximum(wscale, 1e-12)
    out = {
        "kernel_q": jnp.round(w / wscale).astype(jnp.int8),
        "wscale": wscale,
    }
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def quantize_block_linears(tree: Params) -> Params:
    """Quantize every linear ({kernel [..., in, out]}) in a block stack."""
    if isinstance(tree, dict):
        if "kernel" in tree and tree["kernel"].ndim >= 2:
            return quantize_linear(tree)
        return {k: quantize_block_linears(v) for k, v in tree.items()}
    return tree


def linear_w8a8(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """int8×int8→int32 MXU matmul with dynamic per-row activation scales."""
    x32 = x.astype(jnp.float32)
    ascale = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0
    ascale = jnp.maximum(ascale, 1e-8)
    xq = jnp.round(x32 / ascale).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, p["kernel_q"],
        dimension_numbers=(((x.ndim - 1,), (p["kernel_q"].ndim - 2,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = y * ascale * p["wscale"].reshape((1,) * (y.ndim - 1) + (-1,))
    if "bias" in p:
        y = y + p["bias"]
    return y.astype(x.dtype)
