"""Fused MLP-half BACKWARD — Pallas TPU kernel (flat-token form).

Rebuilds the backward of the reference's transformer MLP half
(``x + fc2(QuickGELU(fc1(LN2(x))))`` — the block the reference runs inside
HF ``CLIPModel`` / OpenAI clip, `/root/reference/plip.py:50`,
`reproducibility/embedders/plip.py:48`) as one weight-resident kernel.

Why backward-only: the fused MLP *forward* measured SLOWER than XLA's
globally-scheduled matmuls at every block size tried (PERF.md round 1 —
the MLP holds ~2/3 of block FLOPs and XLA pipelines them across batch
blocks better than one per-program instruction stream). The BACKWARD has a
different bottleneck: under the production ``remat="mlp"`` policy XLA
recomputes fc1/GELU and round-trips the [B*S, 4W] activations through HBM
several times per layer (~157 MB each at ViT-B/32 b512). This kernel
recomputes LN2/fc1/GELU in VMEM from the saved residual input x (the same
thing remat saves), so those activations never touch HBM, and accumulates
all six weight/LN grads in fp32 VMEM across the sequential batch grid —
the same structure as the attention-sublayer backward
(ops/attention.py `_attn_sublayer_bwd_kernel`).

Used via ``mlp_sublayer_flat`` (custom_vjp): forward = plain XLA composed
ops (unchanged encode perf), backward = this kernel. Memory footprint is
identical to ``jax.checkpoint`` of the half (only x is saved).

MEASURED NEGATIVE IN-MODEL (round 2, PERF.md): the backward kernel wins 24%
ISOLATED (46.3 ms vs 61.3 composed for the 12-layer b512 stack at its best
block_b=16; 62.6 at 8, 112.6 at 4), but the full train step LOSES ~2%
(2,131-2,156 vs 2,191 pairs/s): between attention kernels, XLA's MLP ops
overlap their HBM traffic with kernel execution — back-to-back Pallas calls
serialize those windows. Same root cause as the fused MLP forward (also
re-measured flat here: 21.6-22.5 ms vs 19.7 XLA at every block size) and
the whole-block kernel. Kept as parity-tested ops, NOT wired into
models/layers.transformer.
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

from .attention import _interpret_mode, _sublayer_block_b, _use_pallas


def _mlp_bwd_kernel(x_ref, g_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                    dx_ref, dlns_ref, dlnb_ref, dw1_ref, db1_ref, dw2_ref,
                    db2_ref, *, eps: float):
    """One program = [M, W] flat token rows. Recomputes
    LN2 → fc1 → QuickGELU in VMEM, then:

        dW2 += aᵀ g;  db2 += Σg;  da = g W2ᵀ
        dh1 = da ∘ (s + 1.702·h1·s·(1−s))        (QuickGELU VJP, fp32)
        dW1 += lnᵀ dh1;  db1 += Σdh1;  dln = dh1 W1ᵀ
        LN backward (fp32) → dx_ln;  dx = g + dx_ln   (residual)
    """
    @pl.when(pl.program_id(0) == 0)
    def _zero():
        dlns_ref[:] = jnp.zeros_like(dlns_ref)
        dlnb_ref[:] = jnp.zeros_like(dlnb_ref)
        dw1_ref[:, :] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:, :] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    xb = x_ref[:]
    gy = g_ref[:]
    lns32 = lns_ref[:].astype(jnp.float32)
    lnb32 = lnb_ref[:].astype(jnp.float32)
    # ---- recompute forward (identical math to models/layers.mlp + layer_norm)
    x32 = xb.astype(jnp.float32)
    mean = jnp.mean(x32, -1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), -1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x32 - mean) * rstd  # [M, W] fp32
    ln = (xhat * lns32 + lnb32).astype(xb.dtype)
    h1 = (
        jnp.dot(ln, w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[:]
    ).astype(xb.dtype)  # [M, 4W] — bf16, matching the composed forward
    h32 = h1.astype(jnp.float32)
    s = jax.nn.sigmoid(1.702 * h32)
    a = (h32 * s).astype(xb.dtype)  # QuickGELU activation
    # ---- backward
    dw2_ref[:, :] += jax.lax.dot_general(
        a, gy, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    db2_ref[:] += jnp.sum(gy.astype(jnp.float32), axis=0)
    da = jax.lax.dot_general(
        gy, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [M, 4W] fp32
    dgelu = s + 1.702 * h32 * s * (1.0 - s)
    dh1 = (da * dgelu).astype(xb.dtype)
    dw1_ref[:, :] += jax.lax.dot_general(
        ln, dh1, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    db1_ref[:] += jnp.sum(dh1.astype(jnp.float32), axis=0)
    dln = jax.lax.dot_general(
        dh1, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [M, W] fp32
    dlns_ref[:] += jnp.sum(dln * xhat, axis=0)
    dlnb_ref[:] += jnp.sum(dln, axis=0)
    dxhat = dln * lns32
    dx_ln = rstd * (
        dxhat
        - jnp.mean(dxhat, -1, keepdims=True)
        - xhat * jnp.mean(dxhat * xhat, -1, keepdims=True)
    )
    dx_ref[:] = gy + dx_ln.astype(xb.dtype)


def _pallas_mlp_bwd_flat(x2, g2, ln_p, mlp_p, eps,
                         block_b: "int | None" = None, S: int = 8,
                         interpret: "bool | None" = None):
    """Returns (dx2, dln_p, dmlp_p); dx2 flat [N, W] like the inputs.

    ``S`` only feeds the block picker (the MLP is per-token, so any S whose
    blocks tile to multiples of 8 works; callers pass the tower's true S so
    vision/text pick the same block_b as the attention kernels)."""
    N, W = x2.shape
    B = N // S
    if block_b is None:
        # want=16 (M=800 at ViT-B/32): the MLP backward is pure dense
        # matmuls — no block-diag core waste — so unlike the attention
        # kernels it keeps gaining from larger M (measured 112.6 / 62.6 /
        # 46.3 ms for bb 4/8/16 vs 61.3 composed; bench_mlp_bwd.py)
        block_b = _sublayer_block_b(B, S, want=16)
    M = block_b * S
    W4 = mlp_p["fc1"]["kernel"].shape[1]
    w1 = mlp_p["fc1"]["kernel"].astype(x2.dtype)
    w2 = mlp_p["fc2"]["kernel"].astype(x2.dtype)
    const = lambda b: (0,)
    mat = lambda b: (0, 0)
    f32 = jnp.float32
    dx, dlns, dlnb, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, eps=eps),
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec((M, W), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, W), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, W4), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((W4,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W4, W), mat, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((M, W), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, W4), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((W4,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W4, W), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, W), x2.dtype),
            jax.ShapeDtypeStruct((W,), f32),
            jax.ShapeDtypeStruct((W,), f32),
            jax.ShapeDtypeStruct((W, W4), f32),
            jax.ShapeDtypeStruct((W4,), f32),
            jax.ShapeDtypeStruct((W4, W), f32),
            jax.ShapeDtypeStruct((W,), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=_interpret_mode() if interpret is None else interpret,
    )(x2, g2, ln_p["scale"], ln_p["bias"], w1, mlp_p["fc1"]["bias"], w2)
    pdt = ln_p["scale"].dtype
    dln_p = {"scale": dlns.astype(pdt), "bias": dlnb.astype(pdt)}
    dmlp_p = {
        "fc1": {"kernel": dw1.astype(mlp_p["fc1"]["kernel"].dtype),
                "bias": db1.astype(mlp_p["fc1"]["bias"].dtype)},
        "fc2": {"kernel": dw2.astype(mlp_p["fc2"]["kernel"].dtype),
                "bias": db2.astype(mlp_p["fc2"]["bias"].dtype)},
    }
    return dx, dln_p, dmlp_p


def _mlp_fwd_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                    o_ref, *, eps: float):
    """Weight-resident MLP-half forward on a flat [M, W] block:
    LN2 → fc1 → QuickGELU → fc2 → +residual, the [M, 4W] activations never
    leaving VMEM. Round 1 measured the 3D per-row form SLOWER than XLA; the
    flat large-M form re-tests that verdict (see PERF.md)."""
    xb = x_ref[:]
    x32 = xb.astype(jnp.float32)
    mean = jnp.mean(x32, -1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), -1, keepdims=True)
    ln = (
        (x32 - mean) * jax.lax.rsqrt(var + eps)
        * lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(jnp.float32)
    ).astype(xb.dtype)
    h1 = (
        jnp.dot(ln, w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[:]
    ).astype(xb.dtype)
    h32 = h1.astype(jnp.float32)
    a = (h32 * jax.nn.sigmoid(1.702 * h32)).astype(xb.dtype)
    y = (
        jnp.dot(a, w2_ref[:], preferred_element_type=jnp.float32)
        + b2_ref[:]
    ).astype(xb.dtype)
    o_ref[:] = xb + y


def _pallas_mlp_fwd_flat(x2, ln_p, mlp_p, eps, block_b: "int | None" = None,
                         S: int = 8, interpret: "bool | None" = None):
    N, W = x2.shape
    B = N // S
    if block_b is None:
        block_b = _sublayer_block_b(B, S, want=16)
    M = block_b * S
    W4 = mlp_p["fc1"]["kernel"].shape[1]
    const = lambda b: (0,)
    mat = lambda b: (0, 0)
    return pl.pallas_call(
        functools.partial(_mlp_fwd_kernel, eps=eps),
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec((M, W), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, W4), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((W4,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W4, W), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, W), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, W), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=_interpret_mode() if interpret is None else interpret,
    )(x2, ln_p["scale"], ln_p["bias"],
      mlp_p["fc1"]["kernel"].astype(x2.dtype), mlp_p["fc1"]["bias"],
      mlp_p["fc2"]["kernel"].astype(x2.dtype), mlp_p["fc2"]["bias"])


def _jnp_mlp_sublayer_flat(x2, ln_p, mlp_p, eps):
    from ..models.layers import layer_norm, mlp

    return x2 + mlp(layer_norm(x2, ln_p, eps), mlp_p, act="quick_gelu")


def _mlp_pallas_ok(N: int, S: int, mlp_p) -> bool:
    return (_use_pallas() and "kernel" in mlp_p["fc1"]
            and _sublayer_block_b(N // S, S, 4) is not None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def mlp_sublayer_flat(x2, ln_p, mlp_p, S: int, eps: float = 1e-5):
    """``x + fc2(QuickGELU(fc1(LN2(x))))`` on flat [N, W] tokens.

    Forward: plain XLA (the fused forward measured slower — PERF.md).
    Backward: the weight-resident Pallas kernel above on TPU; ``jax.vjp``
    of the composed ops elsewhere. Saves only x — same memory as
    ``jax.checkpoint`` of the half (the remat="mlp" policy)."""
    return _jnp_mlp_sublayer_flat(x2, ln_p, mlp_p, eps)


def _mlp_fwd(x2, ln_p, mlp_p, S, eps):
    return mlp_sublayer_flat(x2, ln_p, mlp_p, S, eps), (x2, ln_p, mlp_p)


def _mlp_bwd(S, eps, res, g):
    x2, ln_p, mlp_p = res
    if _mlp_pallas_ok(x2.shape[0], S, mlp_p):
        out = _pallas_mlp_bwd_flat(x2, g, ln_p, mlp_p, eps, S=S)
        # same scoped-vmem DUS-fusion hazard as the attention backward
        return jax.lax.optimization_barrier(out)
    _, vjp = jax.vjp(
        lambda a, b, c: _jnp_mlp_sublayer_flat(a, b, c, eps),
        x2, ln_p, mlp_p,
    )
    return vjp(g)


mlp_sublayer_flat.defvjp(_mlp_fwd, _mlp_bwd)
