"""Whole-block BACKWARD — one Pallas program differentiates a full pre-LN
transformer block (attention sublayer + MLP sublayer) per batch-block.

Round-2 finding (PERF.md): the image-tower backward is the train-step wall
(50% MFU@3x, 138.6 ms of 245 ms at ViT-B/32 b512) and ISOLATED per-half
kernels cannot beat the status quo — the fused MLP backward wins 24% alone
but loses ~2% in-model because XLA overlaps the MLP's HBM traffic with the
adjacent attention kernels, which back-to-back pallas_calls serialize. This
kernel goes structural instead (VERDICT r2 #1): the MLP backward is fused
INTO the attention-sublayer backward, so one program per batch-block owns
both halves and the overlap XLA used to provide is internalized — the
[M, 4W] MLP activations and the [M, M] attention intermediates never touch
HBM at all, and per layer-backward the only HBM traffic is x/dz/dx blocks
(3×[N, W]), the weights once (VMEM-resident across the grid), and the fp32
grad accumulators once.

Chain (one program, M = block_b * S flat token rows):

  recompute  ln1(x) → qkv → blockdiag softmax (p_h stashed in VMEM scratch)
             → ctx → y = x + ctx·Wout + bout           (attention sublayer)
             ln2(y) → h1 → QuickGELU a                  (MLP half)
  backward   dW2 += aᵀdz; da = dz·W2ᵀ; dh1 = da∘gelu'; dW1 += ln2ᵀdh1;
             dln2 = dh1·W1ᵀ; LN2-bwd → gy = dz + dy_ln
             dWout += ctxᵀgy; dctx = gy·Woutᵀ
             per head (stashed p): dV, dP, dS, dQ, dK
             dWqkv += ln1ᵀdqkv; dln1 = dqkv·Wqkvᵀ; LN1-bwd → dx = gy + dx_ln

Weight/LN grads accumulate in fp32 VMEM across the sequential TPU grid
(constant output index maps), zeroed at program 0 — the same scheme as
`ops/attention._attn_sublayer_bwd_kernel` / `ops/mlp._mlp_bwd_kernel`,
whose math this kernel reuses verbatim (both are parity-tested vs the
composed VJP).

Used via ``block_flat`` (custom_vjp): the forward keeps the measured-best
round-2 split (fused attention-sublayer Pallas forward + plain XLA MLP);
only the backward changes. Residuals = the block input x alone — strictly
less than the ``remat="mlp"`` policy this replaces (which kept 2×[N, W]
per layer).

Rebuilds the training path of the reference's transformer blocks
(`/root/reference/reproducibility/training_model/clip.py:148-226` drives
HF CLIPModel blocks under torch autograd); the reference has no fused or
remat story at all.
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

from .attention import (
    _interpret_mode,
    _blockdiag_mask,
    _pallas_attn_sublayer_flat,
    _sublayer_block_b,
    _use_pallas,
)


def _block_bwd_kernel(x_ref, g_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref,
                      wout_ref, bout_ref, ln2s_ref, ln2b_ref, w1_ref, b1_ref,
                      w2_ref,
                      dx_ref, dln1s_ref, dln1b_ref, dwqkv_ref, dbqkv_ref,
                      dwout_ref, dbout_ref, dln2s_ref, dln2b_ref, dw1_ref,
                      db1_ref, dw2_ref, db2_ref,
                      p_scr, *, heads: int, eps: float, causal: bool, S: int,
                      s_valid: "int | None" = None, cosched: bool = False):
    M, W = x_ref.shape
    D = W // heads
    scale = D ** -0.5

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        dln1s_ref[:] = jnp.zeros_like(dln1s_ref)
        dln1b_ref[:] = jnp.zeros_like(dln1b_ref)
        dwqkv_ref[:, :] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[:] = jnp.zeros_like(dbqkv_ref)
        dwout_ref[:, :] = jnp.zeros_like(dwout_ref)
        dbout_ref[:] = jnp.zeros_like(dbout_ref)
        dln2s_ref[:] = jnp.zeros_like(dln2s_ref)
        dln2b_ref[:] = jnp.zeros_like(dln2b_ref)
        dw1_ref[:, :] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:, :] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    xb = x_ref[:]
    gz = g_ref[:]
    cdt = xb.dtype

    # ---- recompute attention sublayer forward (math identical to
    # _attn_sublayer_kernel; p per head stashed for the backward loop)
    ln1s32 = ln1s_ref[:].astype(jnp.float32)
    x32 = xb.astype(jnp.float32)
    mean1 = jnp.mean(x32, -1, keepdims=True)
    var1 = jnp.mean(jnp.square(x32 - mean1), -1, keepdims=True)
    rstd1 = jax.lax.rsqrt(var1 + eps)
    xhat1 = (x32 - mean1) * rstd1
    ln1 = (xhat1 * ln1s32 + ln1b_ref[:].astype(jnp.float32)).astype(cdt)
    qkv = (
        jnp.dot(ln1, wqkv_ref[:], preferred_element_type=jnp.float32)
        + bqkv_ref[:]
    ).astype(cdt)
    mask = _blockdiag_mask(M, S, causal, s_valid)

    def _fwd_logits(h):
        q = qkv[:, h * D:(h + 1) * D]
        k = qkv[:, W + h * D:W + (h + 1) * D]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        return jnp.where(mask, logits, -jnp.inf)

    def _fwd_sm_pv(h, logits):
        v = qkv[:, 2 * W + h * D:2 * W + (h + 1) * D]
        m = jnp.max(logits, -1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, -1, keepdims=True)
        p_scr[h] = p
        return jnp.dot(p.astype(cdt), v,
                       preferred_element_type=jnp.float32).astype(cdt)

    ctx_cols = []
    if cosched:
        # r4 pipelining (exact math): issue head h+1's QK dot before head
        # h's softmax island so the MXU overlaps the VPU
        logits = _fwd_logits(0)
        for h in range(heads):
            nxt = _fwd_logits(h + 1) if h + 1 < heads else None
            ctx_cols.append(_fwd_sm_pv(h, logits))
            logits = nxt
    else:
        for h in range(heads):
            ctx_cols.append(_fwd_sm_pv(h, _fwd_logits(h)))
    ctx = jnp.concatenate(ctx_cols, axis=-1)  # [M, W]
    y = xb + (
        jnp.dot(ctx, wout_ref[:], preferred_element_type=jnp.float32)
        + bout_ref[:]
    ).astype(cdt)

    # ---- recompute MLP half forward (math identical to _mlp_bwd_kernel)
    ln2s32 = ln2s_ref[:].astype(jnp.float32)
    y32 = y.astype(jnp.float32)
    mean2 = jnp.mean(y32, -1, keepdims=True)
    var2 = jnp.mean(jnp.square(y32 - mean2), -1, keepdims=True)
    rstd2 = jax.lax.rsqrt(var2 + eps)
    yhat = (y32 - mean2) * rstd2
    ln2 = (yhat * ln2s32 + ln2b_ref[:].astype(jnp.float32)).astype(cdt)
    h1 = (
        jnp.dot(ln2, w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[:]
    ).astype(cdt)  # [M, 4W] bf16, matching the composed forward
    h32 = h1.astype(jnp.float32)
    s = jax.nn.sigmoid(1.702 * h32)
    a = (h32 * s).astype(cdt)  # QuickGELU activation

    # ---- MLP backward: dz -> gy. The dW accumulations are NOT on the
    # dx critical path; under cosched they are deferred and interleaved
    # into the attention head loop's VPU islands below (ask: attention-bwd
    # and MLP-bwd as co-scheduled streams — PERF.md train-MFU closure).
    def _acc_dw2():
        dw2_ref[:, :] += jax.lax.dot_general(
            a, gz, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db2_ref[:] += jnp.sum(gz.astype(jnp.float32), axis=0)

    if not cosched:
        _acc_dw2()
    da = jax.lax.dot_general(
        gz, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [M, 4W] fp32
    dgelu = s + 1.702 * h32 * s * (1.0 - s)
    dh1 = (da * dgelu).astype(cdt)

    def _acc_dw1():
        dw1_ref[:, :] += jax.lax.dot_general(
            ln2, dh1, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db1_ref[:] += jnp.sum(dh1.astype(jnp.float32), axis=0)

    if not cosched:
        _acc_dw1()
    dln2 = jax.lax.dot_general(
        dh1, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [M, W] fp32
    dln2s_ref[:] += jnp.sum(dln2 * yhat, axis=0)
    dln2b_ref[:] += jnp.sum(dln2, axis=0)
    dyhat = dln2 * ln2s32
    dy_ln = rstd2 * (
        dyhat
        - jnp.mean(dyhat, -1, keepdims=True)
        - yhat * jnp.mean(dyhat * yhat, -1, keepdims=True)
    )
    gy = gz + dy_ln.astype(cdt)  # residual

    # ---- attention sublayer backward: gy -> dx
    def _acc_dwout():
        dwout_ref[:, :] += jax.lax.dot_general(
            ctx, gy, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbout_ref[:] += jnp.sum(gy.astype(jnp.float32), axis=0)

    if not cosched:
        _acc_dwout()
    dctx = jax.lax.dot_general(
        gy, wout_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cdt)
    dq_cols, dk_cols, dv_cols = [], [], []

    def _bwd_dots(h):
        v = qkv[:, 2 * W + h * D:2 * W + (h + 1) * D]
        p_c = p_scr[h].astype(cdt)
        gh = dctx[:, h * D:(h + 1) * D]
        dv = jax.lax.dot_general(
            p_c, gh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            gh, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dv, dp

    def _bwd_island(h, dv, dp):
        q = qkv[:, h * D:(h + 1) * D]
        k = qkv[:, W + h * D:W + (h + 1) * D]
        p = p_scr[h]  # [M, M] fp32, block-diagonal
        dsum = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = (p * (dp - dsum)).astype(cdt)  # zero off-block
        dq_cols.append(
            (jnp.dot(ds, k, preferred_element_type=jnp.float32)
             * scale).astype(cdt))
        dk_cols.append(
            (jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale).astype(cdt))
        dv_cols.append(dv.astype(cdt))

    if cosched:
        # Co-scheduled streams: the three deferred dW streams (MLP dw2/dw1
        # + attention dwout — all independent of the per-head chain) are
        # issued between head h+1's MXU dots and head h's VPU island, so
        # the VLIW scheduler has dense MXU work to overlap every island
        # with; the head chain itself is pipelined as in
        # attention._core_fwd_bwd_block.
        fillers = [_acc_dw2, _acc_dw1, _acc_dwout]
        pend = _bwd_dots(0)
        for h in range(heads):
            dv, dp = pend
            pend = _bwd_dots(h + 1) if h + 1 < heads else None
            if fillers:
                fillers.pop(0)()
            _bwd_island(h, dv, dp)
        for f in fillers:  # heads < 3 geometries
            f()
    else:
        for h in range(heads):
            dv, dp = _bwd_dots(h)
            _bwd_island(h, dv, dp)
    dqkv = jnp.concatenate(dq_cols + dk_cols + dv_cols, axis=-1)  # [M, 3W]
    dwqkv_ref[:, :] += jax.lax.dot_general(
        ln1, dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbqkv_ref[:] += jnp.sum(dqkv.astype(jnp.float32), axis=0)
    dln1 = jax.lax.dot_general(
        dqkv, wqkv_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [M, W] fp32
    dln1s_ref[:] += jnp.sum(dln1 * xhat1, axis=0)
    dln1b_ref[:] += jnp.sum(dln1, axis=0)
    dxhat1 = dln1 * ln1s32
    dx_ln = rstd1 * (
        dxhat1
        - jnp.mean(dxhat1, -1, keepdims=True)
        - xhat1 * jnp.mean(dxhat1 * xhat1, -1, keepdims=True)
    )
    dx_ref[:] = gy + dx_ln.astype(cdt)


# Trace-time override for the co-scheduled kernel schedule (deferred MLP/out
# dW streams interleaved into the pipelined attention head loop). Math is
# identical either way (tests/test_block_bwd.py covers both); the flag only
# reorders instruction issue. Default False: measured r5 at B/32 b512
# in-model (experiments/bench_cosched.py, one process, interleaved):
# remat="mlp" 233.8 ms vs block_serial 257.6 vs block_cosched 255.4 ms —
# co-scheduling recovers only ~0.9% of the whole-block kernel's ~9% gap to
# the shipped composition, far below the +3% ship rule. This was the last
# untried idea named by PERF.md's train-MFU closure; the front is CLOSED.
_COSCHED = False


def _pallas_block_bwd_flat(x2, g2, p, S, heads, causal, eps,
                           block_b: "int | None" = None,
                           interpret: "bool | None" = None,
                           s_valid: "int | None" = None,
                           cosched: "bool | None" = None):
    """Returns (dx2, dp) — dp mirrors the block param tree with fp32 grads
    cast to each param's dtype; dx2 is flat [N, W] like the inputs."""
    N, W = x2.shape
    B = N // S
    if block_b is None:
        block_b = _sublayer_block_b(B, S, want=_block_bwd_want(S))
    M = block_b * S
    attn_p, mlp_p = p["attn"], p["mlp"]
    W4 = mlp_p["fc1"]["kernel"].shape[1]
    wqkv = attn_p["qkv"]["kernel"].astype(x2.dtype)
    wout = attn_p["out"]["kernel"].astype(x2.dtype)
    w1 = mlp_p["fc1"]["kernel"].astype(x2.dtype)
    w2 = mlp_p["fc2"]["kernel"].astype(x2.dtype)
    const = lambda b: (0,)
    mat = lambda b: (0, 0)
    blk = lambda b: (b, 0)
    f32 = jnp.float32
    vm = lambda shape: pl.BlockSpec(shape, const if len(shape) == 1 else mat,
                                    memory_space=pltpu.VMEM)
    if cosched is None:
        cosched = _COSCHED
    outs = pl.pallas_call(
        functools.partial(_block_bwd_kernel, heads=heads, eps=eps,
                          causal=causal, S=S, s_valid=s_valid,
                          cosched=cosched),
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec((M, W), blk, memory_space=pltpu.VMEM),   # x
            pl.BlockSpec((M, W), blk, memory_space=pltpu.VMEM),   # dz
            vm((W,)), vm((W,)),                                   # ln1
            vm((W, 3 * W)), vm((3 * W,)),                         # qkv
            vm((W, W)), vm((W,)),                                 # out
            vm((W,)), vm((W,)),                                   # ln2
            vm((W, W4)), vm((W4,)),                               # fc1
            vm((W4, W)),                                          # fc2 kernel
        ],
        out_specs=[
            pl.BlockSpec((M, W), blk, memory_space=pltpu.VMEM),   # dx
            vm((W,)), vm((W,)),                                   # dln1
            vm((W, 3 * W)), vm((3 * W,)),                         # dqkv
            vm((W, W)), vm((W,)),                                 # dout
            vm((W,)), vm((W,)),                                   # dln2
            vm((W, W4)), vm((W4,)),                               # dfc1
            vm((W4, W)), vm((W,)),                                # dfc2
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, W), x2.dtype),
            jax.ShapeDtypeStruct((W,), f32),
            jax.ShapeDtypeStruct((W,), f32),
            jax.ShapeDtypeStruct((W, 3 * W), f32),
            jax.ShapeDtypeStruct((3 * W,), f32),
            jax.ShapeDtypeStruct((W, W), f32),
            jax.ShapeDtypeStruct((W,), f32),
            jax.ShapeDtypeStruct((W,), f32),
            jax.ShapeDtypeStruct((W,), f32),
            jax.ShapeDtypeStruct((W, W4), f32),
            jax.ShapeDtypeStruct((W4,), f32),
            jax.ShapeDtypeStruct((W4, W), f32),
            jax.ShapeDtypeStruct((W,), f32),
        ],
        scratch_shapes=[pltpu.VMEM((heads, M, M), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024
        ),
        interpret=_interpret_mode() if interpret is None else interpret,
    )(x2, g2, p["ln1"]["scale"], p["ln1"]["bias"],
      wqkv, attn_p["qkv"]["bias"], wout, attn_p["out"]["bias"],
      p["ln2"]["scale"], p["ln2"]["bias"],
      w1, mlp_p["fc1"]["bias"], w2)
    (dx, dln1s, dln1b, dwqkv, dbqkv, dwout, dbout,
     dln2s, dln2b, dw1, db1, dw2, db2) = outs

    def cast(g, like):
        return g.astype(like.dtype)

    dp = {
        "ln1": {"scale": cast(dln1s, p["ln1"]["scale"]),
                "bias": cast(dln1b, p["ln1"]["bias"])},
        "attn": {
            "qkv": {"kernel": cast(dwqkv, attn_p["qkv"]["kernel"]),
                    "bias": cast(dbqkv, attn_p["qkv"]["bias"])},
            "out": {"kernel": cast(dwout, attn_p["out"]["kernel"]),
                    "bias": cast(dbout, attn_p["out"]["bias"])},
        },
        "ln2": {"scale": cast(dln2s, p["ln2"]["scale"]),
                "bias": cast(dln2b, p["ln2"]["bias"])},
        "mlp": {
            "fc1": {"kernel": cast(dw1, mlp_p["fc1"]["kernel"]),
                    "bias": cast(db1, mlp_p["fc1"]["bias"])},
            "fc2": {"kernel": cast(dw2, mlp_p["fc2"]["kernel"]),
                    "bias": cast(db2, mlp_p["fc2"]["bias"])},
        },
    }
    return dx, dp


def _block_bwd_want(S: int) -> int:
    """Preferred block_b for the whole-block backward. The MLP half's dense
    matmuls keep gaining from larger M while the block-diag attention core's
    wasted FLOPs grow with block_b — with ~3x the dense FLOPs of the
    attention-only backward, the sweet spot sits above attention's 4.
    Measured on v5e (experiments/bench_block_bwd.py, ViT-B/32 b512):
    bb=8 is fastest. Above 128 tokens: one batch row per program — the
    [heads, M, M] p-scratch and the [M, 4W] fp32 MLP buffers both scale
    with M, and the block-diag core waste stops being small."""
    return 8 if S <= 128 else 1


def _jnp_block_flat(x2, p, S, heads, causal, eps, act,
                    s_valid: "int | None" = None):
    from ..models.layers import layer_norm, mlp

    from .attention import _jnp_sublayer_flat_dispatch

    h = _jnp_sublayer_flat_dispatch(x2, p["ln1"], p["attn"], S, heads,
                                    causal, eps, s_valid)
    return h + mlp(layer_norm(h, p["ln2"], eps), p["mlp"], act)


def _block_vmem_bytes(S: int, W: int, W4: int, heads: int, bb: int) -> int:
    """Rough peak working set of the whole-block bwd kernel: bf16 weights +
    fp32 grad accumulators (both VMEM-resident across the grid) + the p
    scratch + ~6 live [M, max(3W, W4)]-class fp32 temporaries (calibrated:
    B/32 bb=8 runs at ~87 MB by this estimate; L/14 bb=1 at ~106 MB was
    RESOURCE_EXHAUSTED on the 128 MB v5e VMEM)."""
    M = bb * S
    weights = 2 * (W * 3 * W + W * W + 2 * W * W4)
    grads = 4 * (W * 3 * W + W * W + 2 * W * W4)
    p_scr = 4 * heads * M * M
    temps = 6 * M * max(3 * W, W4) * 4
    return weights + grads + p_scr + temps


def _block_pallas_ok(N: int, S: int, p, act: str) -> bool:
    from .attention import _MAX_FLAT_M

    if not (_use_pallas() and S <= _MAX_FLAT_M and act == "quick_gelu"
            and "kernel" in p["attn"]["qkv"] and "kernel" in p["mlp"]["fc1"]):
        return False
    bb = _sublayer_block_b(N // S, S, _block_bwd_want(S))
    if bb is None:
        return False
    W = p["attn"]["qkv"]["kernel"].shape[0]
    W4 = p["mlp"]["fc1"]["kernel"].shape[1]
    heads = max(1, W // 64)  # CLIP towers are all head_dim 64
    # Over-budget geometries (ViT-L/14: the fp32 grad accumulators alone
    # are 50 MB) fall back to the composed VJP instead of handing Mosaic an
    # unschedulable allocation (measured RESOURCE_EXHAUSTED).
    return _block_vmem_bytes(S, W, W4, heads, bb) <= 100 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def block_flat(x2, p, S: int, heads: int, causal: bool = False,
               eps: float = 1e-5, act: str = "quick_gelu",
               s_valid: "int | None" = None):
    """Full pre-LN transformer block on flat [N, W] tokens (N = B*S).

    Forward = the measured-best round-2 split: fused attention-sublayer
    Pallas kernel + plain XLA MLP (bit-identical to the composed path).
    Backward = ONE whole-block Pallas kernel (`_block_bwd_kernel`) that owns
    both halves — see module docstring. Residual saved: x2 only.

    ``s_valid``: within-row positions >= s_valid are PAD (excluded as
    attention columns; per-token MLP garbage on pad rows is sliced away by
    the caller and its grads are exactly zero)."""
    if _block_pallas_ok(x2.shape[0], S, p, act):
        h = _pallas_attn_sublayer_flat(x2, p["ln1"], p["attn"], S, heads,
                                       causal, eps, s_valid=s_valid)
        from ..models.layers import layer_norm, mlp

        return h + mlp(layer_norm(h, p["ln2"], eps), p["mlp"], act)
    return _jnp_block_flat(x2, p, S, heads, causal, eps, act, s_valid)


def _block_fwd(x2, p, S, heads, causal, eps, act, s_valid):
    return block_flat(x2, p, S, heads, causal, eps, act, s_valid), (x2, p)


def _block_bwd(S, heads, causal, eps, act, s_valid, res, g):
    x2, p = res
    if _block_pallas_ok(x2.shape[0], S, p, act):
        out = _pallas_block_bwd_flat(x2, g, p, S, heads, causal, eps,
                                     s_valid=s_valid)
        # same scoped-vmem DUS-fusion hazard as the sublayer backwards:
        # keep the scan's dW accumulation out of the pallas-call fusion
        return jax.lax.optimization_barrier(out)
    _, vjp = jax.vjp(
        lambda a, b: _jnp_block_flat(a, b, S, heads, causal, eps, act,
                                     s_valid),
        x2, p,
    )
    return vjp(g)


block_flat.defvjp(_block_fwd, _block_bwd)
