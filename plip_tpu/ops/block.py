"""Whole transformer block as ONE weight-resident Pallas kernel (forward).

VERDICT r1 #1: the last fusion not attempted in round 1. One program
processes a batch-block of rows through the complete pre-LN block —

    x ── LN1 ─ QKV ─ attention ─ out-proj ─(+x)── LN2 ─ fc1 ─ QuickGELU ─ fc2 ─(+)── y

— with every weight matrix VMEM-resident across the batch grid (constant
index maps: Wqkv [W,3W], Wout [W,W], Wfc1 [W,4W], Wfc2 [4W,W] ≈ 13.5 MB bf16
at ViT-B/32 width). Per block of rows, the only HBM traffic is x in and y
out: the qkv/ctx/hidden activations that XLA (and the round-1 sublayer
kernel) round-trip through HBM never leave VMEM.

Matches the block the reference runs inside HF ``CLIPModel.get_image_features``
(`/root/reference/plip.py:50`) and OpenAI clip's ``ResidualAttentionBlock``
(dependency of `/root/reference/reproducibility/embedders/factory.py:21`).

Numerics identical to the composed path: fp32 LN and softmax islands, fp32
matmul accumulation, bf16 emission (models/layers.py conventions).

MEASURED NEGATIVE (round 2, PERF.md): 12.0k img/s at best block_b vs 13.3k
for the default [fused-attention-sublayer + XLA MLP] split at ViT-B/32
batch 512 — same root cause as round 1's fused-MLP-sublayer loss: the MLP
matmuls are ~2/3 of block FLOPs and XLA's global scheduling pipelines them
across batch-blocks better than one per-program instruction stream; the
saved inter-sublayer HBM round-trip (~1 ms) can't cover that. Kept as a
parity-tested op for future hardware/width regimes; NOT wired into
layers.block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False


def _ln(x, scale_ref, bias_ref, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, -1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), -1, keepdims=True)
    return (
        (x32 - mean) * jax.lax.rsqrt(var + eps)
        * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    ).astype(x.dtype)


def _block_kernel(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wout_ref,
                  bout_ref, ln2s_ref, ln2b_ref, wfc1_ref, bfc1_ref, wfc2_ref,
                  bfc2_ref, o_ref, *, heads: int, eps: float, causal: bool,
                  block_b: int):
    for g in range(block_b):
        x = x_ref[g]  # [S, W]
        S, W = x.shape
        D = W // heads
        scale = D ** -0.5
        # ---- attention sublayer (identical math to _attn_sublayer_kernel)
        ln = _ln(x, ln1s_ref, ln1b_ref, eps)
        qkv = (
            jnp.dot(ln, wqkv_ref[:], preferred_element_type=jnp.float32)
            + bqkv_ref[:]
        ).astype(x.dtype)
        ctx_cols = []
        for h in range(heads):
            q = qkv[:, h * D:(h + 1) * D]
            k = qkv[:, W + h * D:W + (h + 1) * D]
            v = qkv[:, 2 * W + h * D:2 * W + (h + 1) * D]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            if causal:
                row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
                col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
                logits = jnp.where(col <= row, logits, -jnp.inf)
            m = jnp.max(logits, -1, keepdims=True)
            p = jnp.exp(logits - m)
            p = p / jnp.sum(p, -1, keepdims=True)
            ctx_cols.append(
                jnp.dot(p.astype(x.dtype), v,
                        preferred_element_type=jnp.float32).astype(x.dtype)
            )
        ctx = jnp.concatenate(ctx_cols, axis=-1)
        a = x + (
            jnp.dot(ctx, wout_ref[:], preferred_element_type=jnp.float32)
            + bout_ref[:]
        ).astype(x.dtype)
        # ---- MLP sublayer
        ln2 = _ln(a, ln2s_ref, ln2b_ref, eps)
        h1 = (
            jnp.dot(ln2, wfc1_ref[:], preferred_element_type=jnp.float32)
            + bfc1_ref[:]
        )  # fp32 [S, 4W]
        h1 = (h1 * jax.nn.sigmoid(1.702 * h1)).astype(x.dtype)  # QuickGELU
        y = (
            jnp.dot(h1, wfc2_ref[:], preferred_element_type=jnp.float32)
            + bfc2_ref[:]
        ).astype(x.dtype)
        o_ref[g] = a + y


def _pallas_block(x, p, heads, causal, eps, block_b: int = 8,
                  interpret: "bool | None" = None):
    B, S, W = x.shape
    while B % block_b:
        block_b //= 2
    dt = x.dtype
    const = lambda b: (0,)
    mat = lambda b: (0, 0)
    kernel = functools.partial(_block_kernel, heads=heads, eps=eps,
                               causal=causal, block_b=block_b)
    return pl.pallas_call(
        kernel,
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, S, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 3 * W), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, W), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 4 * W), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * W, W), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, S, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, W), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=(_interpret_default() if interpret is None else interpret),
    )(
        x,
        p["ln1"]["scale"], p["ln1"]["bias"],
        p["attn"]["qkv"]["kernel"].astype(dt), p["attn"]["qkv"]["bias"],
        p["attn"]["out"]["kernel"].astype(dt), p["attn"]["out"]["bias"],
        p["ln2"]["scale"], p["ln2"]["bias"],
        p["mlp"]["fc1"]["kernel"].astype(dt), p["mlp"]["fc1"]["bias"],
        p["mlp"]["fc2"]["kernel"].astype(dt), p["mlp"]["fc2"]["bias"],
    )


def _jnp_block(x, p, heads, causal, eps):
    """Composed reference path (identical math) — also the VJP fallback."""
    from ..models.layers import attention, layer_norm, mlp

    x = x + attention(layer_norm(x, p["ln1"], eps), p["attn"], heads, causal)
    return x + mlp(layer_norm(x, p["ln2"], eps), p["mlp"], "quick_gelu")


def _interpret_default() -> bool:
    from .attention import _interpret_mode

    return _interpret_mode()


def _use_pallas() -> bool:
    # shared gate (incl. PLIP_TPU_INTERPRET=1 CPU coverage) — keep in sync
    # with ops.attention rather than duplicating the platform check
    from .attention import _use_pallas as _gate

    return _HAS_PALLAS and _gate()


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def transformer_block(x, p, heads: int, causal: bool = False,
                      eps: float = 1e-5):
    """One fused pre-LN transformer block (QuickGELU MLP) on TPU; composed
    jnp elsewhere. Inference-oriented; the VJP falls back to the composed
    path (training uses models/layers.block with remat)."""
    if _use_pallas() and x.shape[1] <= 128 and "kernel" in p["attn"]["qkv"]:
        return _pallas_block(x, p, heads, causal, eps)
    return _jnp_block(x, p, heads, causal, eps)


def _fwd(x, p, heads, causal, eps):
    return transformer_block(x, p, heads, causal, eps), (x, p)


def _bwd(heads, causal, eps, res, g):
    x, p = res
    _, vjp = jax.vjp(lambda a, b: _jnp_block(a, b, heads, causal, eps), x, p)
    return vjp(g)


transformer_block.defvjp(_fwd, _bwd)
