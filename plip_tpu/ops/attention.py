"""Fused multi-head attention — Pallas TPU kernel.

Why this exists: the CLIP towers have short sequences (50 vision / 77 text
tokens) with head_dim 64. XLA's batched-einsum lowering materializes the
``[B, H, S, S]`` fp32 logits in HBM and round-trips it through softmax —
measured at ~50% of total ViT-B/32 encode time on v5e despite being ~1% of
the FLOPs. This kernel keeps the whole attention core (QK^T → masked softmax
→ @V, fp32 accumulation) in VMEM per batch-block: logits never touch HBM.

Layout contract: takes the fused-QKV activation ``[B, S, 3W]`` exactly as the
preceding matmul produces it (no host-visible transposes); emits ``[B, S, W]``
ready for the out-projection.

Differentiable via custom VJP: the backward is a second Pallas kernel that
recomputes P in VMEM (flash-style) and produces dQKV in the same fused
layout — so training avoids the XLA logits round-trip in both directions.
(jnp formulations remain as the off-TPU fallback for both passes.)
"""

from __future__ import annotations

import functools
import os
import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False


def _mha_kernel(qkv_ref, out_ref, *, heads: int, head_dim: int, causal: bool,
                block_b: int, s_valid: "int | None" = None):
    """Per-batch-row attention core. Two head-loop schedules:

    - S <= 128 (B/32 vision, text): the straight per-head chain — measured
      optimal there, with the bit-exact normalize-first softmax (the
      deferred divide was ~1.5% slower end-to-end at B/32, PERF.md r2).
    - S > 128 (ViT-L/14's 257): SOFTWARE-PIPELINED — head h+1's QK^T dot is
      issued before head h's softmax/PV so Mosaic overlaps MXU dots with the
      VPU softmax (the serialized chain measured as their SUM, ~1.13
      ms/call at b128 vs ~0.68 pipelined), and the softmax divide is
      deferred past the PV dot (one [S, D] fp32 divide instead of [S, S]).
      Measured together: -13% core time at S=257; the reorder WITHOUT the
      deferred divide was negative (experiments/bench_l14_pipe.py, r4).
      fp-reassociation only — parity within bf16 tolerance."""
    W = heads * head_dim
    scale = head_dim ** -0.5
    S = qkv_ref.shape[1]
    masked = causal or (s_valid is not None and s_valid < S)
    mask = _row_mask(S, causal, s_valid) if masked else None

    def qk(g, h):
        qkv = qkv_ref[g]  # [S, 3W]
        q = qkv[:, h * head_dim:(h + 1) * head_dim].astype(jnp.float32) * scale
        k = qkv[:, W + h * head_dim:W + (h + 1) * head_dim]
        logits = jax.lax.dot_general(
            q.astype(qkv.dtype), k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S, S]
        return jnp.where(mask, logits, -jnp.inf) if masked else logits

    def sm_pv(g, h, logits, defer: bool):
        qkv = qkv_ref[g]
        v = qkv[:, 2 * W + h * head_dim:2 * W + (h + 1) * head_dim]
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        if defer:
            denom = jnp.sum(p, axis=-1, keepdims=True)
            ctx = jnp.dot(p.astype(qkv.dtype), v,
                          preferred_element_type=jnp.float32) / denom
        else:
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            ctx = jnp.dot(p.astype(qkv.dtype), v,
                          preferred_element_type=jnp.float32)
        out_ref[g, :, h * head_dim:(h + 1) * head_dim] = ctx.astype(
            out_ref.dtype)

    chain = [(g, h) for g in range(block_b) for h in range(heads)]
    if S > 128:
        logits = qk(*chain[0])
        for i, (g, h) in enumerate(chain):
            logits_next = qk(*chain[i + 1]) if i + 1 < len(chain) else None
            sm_pv(g, h, logits, defer=True)
            logits = logits_next
    else:
        for g, h in chain:
            sm_pv(g, h, qk(g, h), defer=False)


def _pallas_mha(qkv: jnp.ndarray, heads: int, causal: bool,
                block_b: int = 1, interpret: "bool | None" = None,
                s_valid: "int | None" = None) -> jnp.ndarray:
    # block_b=1 measured fastest on v5e (smaller blocks pipeline better:
    # 11.5k img/s vs 8.8k at block_b=8 for ViT-B/32 batch-512 encode)
    B, S, W3 = qkv.shape
    W = W3 // 3
    head_dim = W // heads
    while B % block_b:
        block_b //= 2
    grid = (B // block_b,)
    kernel = functools.partial(
        _mha_kernel, heads=heads, head_dim=head_dim, causal=causal,
        block_b=block_b, s_valid=s_valid
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, S, W3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, S, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, W), qkv.dtype),
        interpret=_interpret_mode() if interpret is None else interpret,
    )(qkv)


def _mha_bwd_kernel(qkv_ref, g_ref, dqkv_ref, *, heads: int, head_dim: int,
                    causal: bool, block_b: int,
                    s_valid: "int | None" = None):
    """dQKV for the fused attention. Per (batch row, head): recompute P in
    fp32, then the standard softmax-attention backward:

        dV = Pᵀ g;  dP = g Vᵀ;  dS = P ∘ (dP − rowsum(dP ∘ P));
        dQ = dS K · scale;  dK = dSᵀ Q · scale

    Causal masking needs no special handling in the backward: masked P is 0,
    which zeroes dS there.
    """
    W = heads * head_dim
    scale = head_dim ** -0.5
    S = qkv_ref.shape[1]
    for b in range(block_b):
        qkv = qkv_ref[b]
        g = g_ref[b]
        for h in range(heads):
            sl_q = slice(h * head_dim, (h + 1) * head_dim)
            sl_k = slice(W + h * head_dim, W + (h + 1) * head_dim)
            sl_v = slice(2 * W + h * head_dim, 2 * W + (h + 1) * head_dim)
            q = qkv[:, sl_q]
            k = qkv[:, sl_k]
            v = qkv[:, sl_v]
            gh = g[:, h * head_dim:(h + 1) * head_dim]

            logits = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            if causal or (s_valid is not None and s_valid < S):
                logits = jnp.where(_row_mask(S, causal, s_valid), logits,
                                   -jnp.inf)
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)  # [S, S] fp32

            p_c = p.astype(qkv.dtype)
            # dV = P^T g
            dv = jax.lax.dot_general(
                p_c, gh, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # dP = g V^T
            dp = jax.lax.dot_general(
                gh, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dsum = jnp.sum(dp * p, axis=-1, keepdims=True)
            ds = (p * (dp - dsum)).astype(qkv.dtype)  # [S, S]
            dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(
                ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            dqkv_ref[b, :, sl_q] = dq.astype(dqkv_ref.dtype)
            dqkv_ref[b, :, sl_k] = dk.astype(dqkv_ref.dtype)
            dqkv_ref[b, :, sl_v] = dv.astype(dqkv_ref.dtype)


def _pallas_mha_bwd(qkv: jnp.ndarray, g: jnp.ndarray, heads: int, causal: bool,
                    block_b: int = 1, interpret: "bool | None" = None,
                    s_valid: "int | None" = None) -> jnp.ndarray:
    B, S, W3 = qkv.shape
    W = W3 // 3
    head_dim = W // heads
    while B % block_b:
        block_b //= 2
    kernel = functools.partial(
        _mha_bwd_kernel, heads=heads, head_dim=head_dim, causal=causal,
        block_b=block_b, s_valid=s_valid,
    )
    return pl.pallas_call(
        kernel,
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, S, W3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, S, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, S, W3), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, W3), qkv.dtype),
        interpret=_interpret_mode() if interpret is None else interpret,
    )(qkv, g)


# ---------------------------------------------------------------------------
# S-blocked ("flash-style") forward for long sequences (S > 128, e.g.
# ViT-L/14's 257 tokens). The batch-row kernel above unrolls a Python loop
# over heads inside one program — fine at S<=77 where the whole row is small,
# but at S=257 it serializes 16 head computations in one instruction stream
# and tiles [264, 384]-padded logits per head. Here the grid is
# (batch, q-block, head) with head fastest:
#   - the K/V rows (full [S, 3W] slice of the fused-QKV activation) are
#     fetched ONCE per batch row and stay VMEM-resident across all
#     (q-block, head) steps — the index map ignores iq/h, so Pallas skips the
#     re-fetch;
#   - each program computes one [BQ, S] logits tile in fp32 (never a padded
#     [S, S]), exact softmax over the true S, and writes one [BQ, D] context
#     column slice; out-of-range q rows in the final block are dropped by the
#     blocked output spec;
#   - programs are small and independent, so Mosaic pipelines DMA against
#     MXU/VPU work instead of executing one giant per-row program.
# ---------------------------------------------------------------------------


def _flash_block_q(S: int) -> int:
    """Pick the q-block (multiple of 16). Measured on v5e at S=257: per-
    program overhead dominates padding waste — bq=272 (one block) gave 697
    img/s vs 577 at bq=96, 565 at 128 and 263 at 16 — so prefer the largest
    block: the whole (16-padded) sequence when it fits, else 256-row tiles."""
    pad16 = -(-S // 16) * 16
    return pad16 if pad16 <= 512 else 256


def _flash_kernel(q_ref, kv_ref, o_ref, *, heads: int, head_dim: int,
                  causal: bool, block_q: int, heads_per_prog: int,
                  pipeline: bool = False):
    """One program = one (batch row, q block, head group). Head groups pack
    ``heads_per_prog`` heads so the dynamic lane offset ``hg * group_width``
    is a provable multiple of 128 (Mosaic rejects dynamic 64-lane offsets);
    the per-head 64-lane splits below are *static* slices of the loaded
    group, which Mosaic handles.

    ``pipeline=True`` applies the round-4 schedule (see ``_mha_kernel``):
    head j+1's QK^T dot is issued before head j's softmax/PV so the MXU
    overlaps the VPU softmax, and the softmax divide is deferred past the
    PV dot ([BQ, D] divide instead of [BQ, S]). Measured at L/14@336
    (S=577, round 5): the shipped combination is pipeline + hpp=16
    (single head group per q block — the longest in-program chain), 40.2
    -> 11.9 ms of in-scan attention time, encode 294 -> 380 img/s b32."""
    hg = pl.program_id(2)
    iq = pl.program_id(1)
    W = heads * head_dim
    S = kv_ref.shape[1]
    scale = head_dim ** -0.5
    gw = heads_per_prog * head_dim  # group width, multiple of 128
    off = pl.multiple_of(hg * gw, gw)
    qg = q_ref[0, :, pl.ds(off, gw)]  # [BQ, gw]
    kg = kv_ref[0, :, pl.ds(W + off, gw)]  # [S, gw]
    vg = kv_ref[0, :, pl.ds(2 * W + off, gw)]  # [S, gw]

    def qk(j):
        sl = slice(j * head_dim, (j + 1) * head_dim)
        q32 = qg[:, sl].astype(jnp.float32) * scale
        logits = jax.lax.dot_general(
            q32.astype(qg.dtype), kg[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, S]
        if causal:
            row = iq * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, S), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (block_q, S), 1)
            logits = jnp.where(col <= row, logits, -jnp.inf)
        return logits

    def sm_pv(j, logits, defer):
        sl = slice(j * head_dim, (j + 1) * head_dim)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        if defer:
            denom = jnp.sum(p, axis=-1, keepdims=True)
            ctx = jnp.dot(p.astype(qg.dtype), vg[:, sl],
                          preferred_element_type=jnp.float32) / denom
        else:
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            ctx = jnp.dot(p.astype(qg.dtype), vg[:, sl],
                          preferred_element_type=jnp.float32)
        return ctx.astype(o_ref.dtype)

    ctx_cols = []
    if pipeline:
        logits = qk(0)
        for j in range(heads_per_prog):
            nxt = qk(j + 1) if j + 1 < heads_per_prog else None
            ctx_cols.append(sm_pv(j, logits, defer=True))
            logits = nxt
    else:
        for j in range(heads_per_prog):
            ctx_cols.append(sm_pv(j, qk(j), defer=False))
    o_ref[0, :, pl.ds(off, gw)] = jnp.concatenate(ctx_cols, axis=-1)


def _head_groups(heads: int, head_dim: int, hpp: int | None = None):
    """Heads per program such that the dynamic lane offset is a provable
    multiple of 128 (or there is a single group)."""
    if hpp is None:
        hpp = max(1, 128 // head_dim)
        while heads % hpp:
            hpp //= 2
    if (hpp * head_dim) % 128 and heads != hpp:
        hpp = heads  # cannot form 128-aligned groups (odd geometries)
    return hpp


def _headgrid_kernel(qkv_ref, o_ref, *, heads: int, head_dim: int,
                     causal: bool, heads_per_prog: int):
    """Single-q-block variant: one program = (batch row, head group), the
    full [S, 3W] row fetched once and resident across the group sweep. Beats
    the 16-head-unrolled per-row kernel at S=257 by pipelining head groups
    across programs instead of serializing them in one instruction stream."""
    hg = pl.program_id(1)
    W = heads * head_dim
    S = qkv_ref.shape[1]
    scale = head_dim ** -0.5
    gw = heads_per_prog * head_dim
    off = pl.multiple_of(hg * gw, gw)
    qg = qkv_ref[0, :, pl.ds(off, gw)]
    kg = qkv_ref[0, :, pl.ds(W + off, gw)]
    vg = qkv_ref[0, :, pl.ds(2 * W + off, gw)]
    ctx_cols = []
    for j in range(heads_per_prog):
        sl = slice(j * head_dim, (j + 1) * head_dim)
        q32 = qg[:, sl].astype(jnp.float32) * scale
        logits = jax.lax.dot_general(
            q32.astype(qg.dtype), kg[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
            logits = jnp.where(col <= row, logits, -jnp.inf)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        ctx_cols.append(
            jnp.dot(p.astype(qg.dtype), vg[:, sl],
                    preferred_element_type=jnp.float32).astype(o_ref.dtype)
        )
    o_ref[0, :, pl.ds(off, gw)] = jnp.concatenate(ctx_cols, axis=-1)


def _pallas_mha_headgrid(qkv: jnp.ndarray, heads: int, causal: bool,
                         interpret: "bool | None" = None,
                         hpp: int | None = None) -> jnp.ndarray:
    B, S, W3 = qkv.shape
    W = W3 // 3
    head_dim = W // heads
    hpp = _head_groups(heads, head_dim, hpp)
    kernel = functools.partial(
        _headgrid_kernel, heads=heads, head_dim=head_dim, causal=causal,
        heads_per_prog=hpp,
    )
    return pl.pallas_call(
        kernel,
        grid=(B, heads // hpp),
        in_specs=[
            pl.BlockSpec((1, S, W3), lambda b, g: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, W), lambda b, g: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, W), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_interpret_mode() if interpret is None else interpret,
    )(qkv)


# Per-row kernel S ceiling (dispatch boundary vs the flash grid). 512 is the
# measured boundary; experiments/bench_336_core.py overrides it to force the
# per-row kernel at S=577 for A/Bs (trace-time, like the overrides below).
_PERROW_MAX_S = 512

# Long-S (>512) flash-kernel experiment overrides (trace-time! compile the
# jit INSIDE the override scope — CLAUDE.md round-4 trap). None = shipped
# defaults below; experiments/bench_336_core.py is the A/B harness.
_FLASH_PIPE_OVERRIDE: "bool | None" = None
_FLASH_HPP_OVERRIDE: "int | None" = None
_FLASH_BQ_OVERRIDE: "int | None" = None


def _pallas_flash_mha(qkv: jnp.ndarray, heads: int, causal: bool,
                      interpret: "bool | None" = None,
                      block_q: int | None = None,
                      hpp: int | None = None,
                      pipeline: "bool | None" = None) -> jnp.ndarray:
    B, S, W3 = qkv.shape
    W = W3 // 3
    head_dim = W // heads
    if hpp is None:
        hpp = _FLASH_HPP_OVERRIDE
    if hpp is None:
        hpp = heads  # single group: longest in-program chain (r5, L/14@336)
    hpp = _head_groups(heads, head_dim, hpp)
    block_q = block_q or _FLASH_BQ_OVERRIDE or _flash_block_q(S)
    nq = -(-S // block_q)
    if pipeline is None:
        pipeline = (_FLASH_PIPE_OVERRIDE
                    if _FLASH_PIPE_OVERRIDE is not None else True)
    kernel = functools.partial(
        _flash_kernel, heads=heads, head_dim=head_dim, causal=causal,
        block_q=block_q, heads_per_prog=hpp, pipeline=pipeline,
    )
    return pl.pallas_call(
        kernel,
        grid=(B, nq, heads // hpp),  # groups fastest: q/kv/out stay resident
        in_specs=[
            pl.BlockSpec((1, block_q, W3), lambda b, iq, h: (b, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, W3), lambda b, iq, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, W), lambda b, iq, h: (b, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, W), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_interpret_mode() if interpret is None else interpret,
    )(qkv, qkv)


def _jnp_mha(qkv: jnp.ndarray, heads: int, causal: bool,
             s_valid: "int | None" = None) -> jnp.ndarray:
    """Reference formulation (identical math, XLA lowering)."""
    B, S, W3 = qkv.shape
    W = W3 // 3
    head_dim = W // heads
    scale = head_dim ** -0.5
    qkv_r = qkv.reshape(B, S, 3, heads, head_dim)
    q, k, v = qkv_r[:, :, 0], qkv_r[:, :, 1], qkv_r[:, :, 2]
    logits = jnp.einsum(
        "bshd,bthd->bhst", q * scale, k, preferred_element_type=jnp.float32
    )
    if causal:
        mask = jnp.triu(jnp.full((S, S), -jnp.inf, jnp.float32), k=1)
        logits = logits + mask
    if s_valid is not None and s_valid < S:
        logits = jnp.where(jnp.arange(S)[None, None, None, :] < s_valid,
                           logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1).astype(qkv.dtype)
    ctx = jnp.einsum("bhst,bthd->bshd", probs, v, preferred_element_type=jnp.float32)
    return ctx.astype(qkv.dtype).reshape(B, S, W)


def _interpret_mode() -> bool:
    """PLIP_TPU_INTERPRET=1: run every Pallas kernel in interpret mode —
    lets CPU CI drive the REAL fused-kernel dispatch end-to-end (slow;
    tiny shapes only). Wrappers whose ``interpret`` arg is None resolve it
    from this."""
    return os.environ.get("PLIP_TPU_INTERPRET", "") == "1"


def _use_pallas() -> bool:
    if not _HAS_PALLAS:
        return False
    if _interpret_mode():
        return True
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def fused_attention(qkv: jnp.ndarray, heads: int, causal: bool = False,
                    s_valid: "int | None" = None) -> jnp.ndarray:
    """[B, S, 3W] fused-QKV activations -> [B, S, W] attention context.

    ``s_valid``: exclude key/value positions >= s_valid (sequence padded
    S_real -> S; pad-row outputs are garbage the caller slices away).

    Dispatch (all measured on v5e, PERF.md): the per-batch-row kernel wins
    for every CLIP-family sequence length INCLUDING ViT-L/14's S=257 — at 257
    it ran 790 img/s vs 772 (head-group grid) and 724 (q-blocked flash), i.e.
    the 16-head in-program unroll costs less than grid-program overhead at
    this scale. The q-blocked flash grid takes over for S > 512 — re-measured
    at S=577 (L/14@336, round 5) after pipelining BOTH kernels: the per-row
    kernel compiles there but loses to the pipelined single-group flash
    (see experiments/bench_336_core.py), so the 512 boundary stands
    (s_valid masking is plumbed only through the per-row kernel; long-S
    padded sequences take the jnp path)."""
    if _use_pallas() and qkv.shape[1] <= _PERROW_MAX_S:
        return _pallas_mha(qkv, heads, causal, s_valid=s_valid)
    if _use_pallas() and qkv.shape[1] > _PERROW_MAX_S and s_valid is None:
        return _pallas_flash_mha(qkv, heads, causal)
    return _jnp_mha(qkv, heads, causal, s_valid)


def _fwd(qkv, heads, causal, s_valid):
    return fused_attention(qkv, heads, causal, s_valid), qkv


def _bwd(heads, causal, s_valid, qkv, g):
    # Mirror the forward's S-threshold: above 512 the forward takes the
    # q-blocked flash kernel precisely because whole-row [S, S] per-head
    # logits would exhaust VMEM — the whole-row backward kernel has the same
    # working set, so it must not be dispatched there. The composed VJP (XLA
    # HBM logits) is the correct long-S fallback; latent-only for the CLIP
    # family (max S=257), but the op's contract covers arbitrary S.
    if _use_pallas() and qkv.shape[1] <= _PERROW_MAX_S:
        return (_pallas_mha_bwd(qkv, g, heads, causal, s_valid=s_valid),)
    _, vjp = jax.vjp(lambda a: _jnp_mha(a, heads, causal, s_valid), qkv)
    return vjp(g)


fused_attention.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Whole attention sublayer: LN1 + QKV + attention + out-proj + residual in one
# kernel. Measured +8% ViT-B/32 encode over the attention-core-only kernel
# (12.0k -> 13.1k img/s on v5e): the QKV/ctx activations never round-trip HBM,
# and the weights stay VMEM-resident across the batch grid (constant index
# maps). Output is bit-identical to the composed path.
# ---------------------------------------------------------------------------


_MAX_FLAT_M = 1056  # bwd working-set bound (see picker docstring); admits
# block_b=4 at ViT-L/14's padded S=264 for the row-blocked core


def _flat_want(S: int) -> int:
    """Preferred block_b: 4 (M=200 at ViT-B/32) measured best for the
    short-S block-diagonal core, and the row-blocked core above 128 tokens
    has zero core waste at any block_b, so larger-M dense matmuls win there
    too (the picker's bb*S <= _MAX_FLAT_M cap bounds the working set)."""
    return 4


# Experiment override for the core formulation: None = default policy;
# {"fwd": v, "bwd": v} forces a per-pass core shape where legal
# (experiments/bench_text_rowcore.py, bench_core_chunk.py). v may be:
#   False/None -> whole-block block-diagonal; True/1 -> row-blocked;
#   int c > 1  -> chunked ([c*S, c*S] masked core dots).
_ROW_CORE_OVERRIDE: "dict | None" = None


def _core_chunk(S: int, block_b: int, bwd: bool) -> "int | None":
    """Batch-rows per attention-core dot inside a flat-sublayer program.

    The program's dense matmuls always run at M = block_b*S rows; this picks
    the CORE formulation only:
      None -> whole-block block-diagonal: one [M, M] masked dot per head
              (waste (block_b-1)/block_b of core FLOPs, maximal dot size);
      1    -> row-blocked: block_b exact [S, S] dots per head (zero core
              waste, but small dots pipeline poorly — text S=80 measured
              neutral-to-worse, PERF.md round 3);
      c    -> chunked middle ground: block_b/c masked [c*S, c*S] dots per
              head (waste (c-1)/c, dots still MXU-sized).

    Defaults: S > 128 rows are row-blocked (block-diag waste there is a
    large share of no-longer-small core FLOPs); S <= 128 chunk=2 where
    legal (text S=80 bb=8: 230.9 vs 234.1 ms b512 train, +1.4% — the
    measured round-3 winner over whole-block; row-blocked chunk=1 lost),
    falling back to whole-block otherwise (vision S=50 is not 8-alignable
    at c=2, so it keeps the whole-block core unchanged).
    Chunk slicing needs 8-aligned sublane offsets ((c*S) % 8 == 0) and
    block_b % c == 0 — illegal requests fall back to whole-block."""
    if _ROW_CORE_OVERRIDE is not None:
        v = _ROW_CORE_OVERRIDE.get("bwd" if bwd else "fwd", False)
        want = None if v in (False, None) else (1 if v is True else int(v))
    else:
        want = 1 if S > 128 else 2
    if want is None or want >= block_b:
        return None
    if block_b % want or (want * S) % 8:
        return None
    return want


def _sublayer_block_b(B: int, S: int, want: int) -> "int | None":
    """Pick block_b for the flat-token sublayer kernels: needs ``B % bb == 0``
    and ``(bb*S) % 8 == 0`` (Mosaic sublane divisibility), except ``bb == B``
    where the block equals the whole array (always legal). Candidates are
    capped at ``bb*S <= _MAX_FLAT_M``: the BACKWARD kernel holds ~4 live
    [M, M] fp32 intermediates (logits/p/dp/ds) per head plus two [M, M]
    int32 mask iotas — at M=2048 that alone is ~100 MB, over the vmem limit
    once [M, 3W] activations join; M<=1024 keeps the bwd set < 40 MB at any
    CLIP width. Returns None when no legal block exists — callers then fall
    back to the composed path (or pad S so one exists; see
    models/layers.transformer)."""
    cands = [bb for bb in range(1, B + 1)
             if B % bb == 0 and (bb * S) % 8 == 0 and bb * S <= _MAX_FLAT_M]
    if not cands:
        return B if B * S <= _MAX_FLAT_M else None
    ge = [bb for bb in cands if bb >= want]
    return min(ge) if ge else max(cands)


def _blockdiag_mask(M: int, S: int, causal: bool, s_valid: "int | None" = None):
    """fp32 {0,1} mask for block-diagonal attention over ``M = block_b*S``
    flattened rows: token i may attend token j iff they belong to the same
    batch row (i//S == j//S), AND j <= i within the row if causal, AND
    j's within-row position is < ``s_valid`` when given (PAD columns from a
    sequence padded S_real -> S are excluded, so padded runs are bit-exact
    for the real tokens — the vision towers use this for S ∤ 8 / S > 128
    geometries, e.g. ViT-B/16's 197 -> 200 and ViT-L/14's 257 -> 264)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
    ok = (r // S) == (c // S)
    if causal:
        ok = jnp.logical_and(ok, (c - (c // S) * S) <= (r - (r // S) * S))
    if s_valid is not None and s_valid < S:
        ok = jnp.logical_and(ok, (c - (c // S) * S) < s_valid)
    return ok


def _row_mask(S: int, causal: bool, s_valid: "int | None"):
    """[S, S] within-row mask (causal triangle + PAD columns >= s_valid) for
    the row-blocked core — the S > 128 formulation where each batch row's
    attention is its own exact [S, S] dot (no block-diagonal waste)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    ok = jnp.ones((S, S), bool)
    if causal:
        ok = c <= r
    if s_valid is not None and s_valid < S:
        ok = jnp.logical_and(ok, c < s_valid)
    return ok


def _attn_sublayer_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                          wout_ref, bout_ref, o_ref, qkv_out_ref=None, *,
                          heads: int, eps: float,
                          causal: bool, S: int,
                          s_valid: "int | None" = None,
                          core_chunk: "int | None" = None):
    """One program = ``block_b`` batch rows, flattened to ``M = block_b*S``
    token rows (the flatten happens OUTSIDE the kernel, where [B,S,W] →
    [B*S,W] is a free contiguous reshape — an in-kernel reshape of a
    sublane-padded [block_b,50,W] tile relayouts every row and measured
    SLOWER than the per-row kernel it replaced).

    Dense ops (LN, QKV, out-proj, residual) run once per program at M rows
    (M=400 for ViT-B/32 block_b=8 vs the old per-row M=50 — the M=50 dots
    padded to 64 sublanes left the MXU ~60% idle in the matmuls holding most
    of the sublayer FLOPs; measured 38% MFU fwd / 27%@3x bwd,
    bench_bwd_halves.py). The attention core is computed BLOCK-DIAGONALLY:
    one [M, M] masked logits dot per head instead of block_b small [S, S]
    dots. The masked columns contribute exact 0.0 to softmax sums and PV
    dots, so results are bit-identical to the per-row formulation; the extra
    FLOPs are ~3% of the sublayer and buy aligned shapes, no row slicing,
    and ~4x fewer Mosaic dots (faster compiles)."""
    M, W = x_ref.shape
    D = W // heads
    scale = D ** -0.5
    xb = x_ref[:]
    x32 = xb.astype(jnp.float32)
    mean = jnp.mean(x32, -1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), -1, keepdims=True)
    ln = (
        (x32 - mean) * jax.lax.rsqrt(var + eps)
        * lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(jnp.float32)
    ).astype(xb.dtype)
    qkv = (
        jnp.dot(ln, wqkv_ref[:], preferred_element_type=jnp.float32)
        + bqkv_ref[:]
    ).astype(xb.dtype)
    if qkv_out_ref is not None:
        # save-qkv training mode: emit the QKV activations so the dW-split
        # backward kernel can skip its recompute matmul (_BWD_MODE)
        qkv_out_ref[:] = qkv
    # Attention core: the program's M = block_b*S token rows are processed
    # in chunks of Mc = core_chunk*S rows (core_chunk=None -> one whole-
    # block [M, M] block-diagonal masked dot per head; 1 -> block_b exact
    # [S, S] dots; c -> masked [c*S, c*S] dots — see _core_chunk). Masked
    # columns contribute exact 0.0 to softmax sums and PV dots, so every
    # chunk size is bit-identical to the per-row formulation.
    Mc = M if core_chunk is None else core_chunk * S
    mask = _blockdiag_mask(Mc, S, causal, s_valid)
    pipeline = _pipe_fwd(S)
    chain_ix = [(rb, h) for rb in range(M // Mc) for h in range(heads)]

    def qk(rb, h):
        sl = slice(rb * Mc, (rb + 1) * Mc)
        q = qkv[sl, h * D:(h + 1) * D]
        k = qkv[sl, W + h * D:W + (h + 1) * D]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        return jnp.where(mask, logits, -jnp.inf)

    cols = {}

    def consume(rb, h, logits):
        sl = slice(rb * Mc, (rb + 1) * Mc)
        v = qkv[sl, 2 * W + h * D:2 * W + (h + 1) * D]
        m = jnp.max(logits, -1, keepdims=True)
        p = jnp.exp(logits - m)
        if pipeline:
            # deferred divide: one [Mc, D] fp32 divide after the PV dot.
            # Round-2 measured defer-alone ~1.5% SLOWER end-to-end at B/32;
            # paired with the explicit pipelining it wins (PERF.md r4) —
            # the pairing is required, do not split them.
            denom = jnp.sum(p, -1, keepdims=True)
            cols[rb, h] = (
                jnp.dot(p.astype(xb.dtype), v,
                        preferred_element_type=jnp.float32) / denom
            ).astype(xb.dtype)
        else:
            # bit-exact normalize-first form (matches the composed oracle)
            p = p / jnp.sum(p, -1, keepdims=True)
            cols[rb, h] = jnp.dot(
                p.astype(xb.dtype), v, preferred_element_type=jnp.float32
            ).astype(xb.dtype)

    if pipeline:  # issue chain i+1's QK dot before chain i's softmax/PV
        logits = qk(*chain_ix[0])
        for i, (rb, h) in enumerate(chain_ix):
            logits_next = qk(*chain_ix[i + 1]) if i + 1 < len(chain_ix) else None
            consume(rb, h, logits)
            logits = logits_next
    else:
        for rb, h in chain_ix:
            consume(rb, h, qk(rb, h))
    ctx_rows = [
        jnp.concatenate([cols[rb, h] for h in range(heads)], axis=-1)
        for rb in range(M // Mc)
    ]
    ctx = ctx_rows[0] if len(ctx_rows) == 1 else jnp.concatenate(ctx_rows, 0)
    y = (
        jnp.dot(ctx, wout_ref[:], preferred_element_type=jnp.float32)
        + bout_ref[:]
    ).astype(xb.dtype)
    o_ref[:] = xb + y


def _pallas_attn_sublayer_flat(x2, ln_p, attn_p, S, heads, causal, eps,
                               block_b: "int | None" = None,
                               interpret: "bool | None" = None,
                               s_valid: "int | None" = None,
                               emit_qkv: bool = False):
    # block_b=4 (M=200 token rows) measured best on v5e for the flat
    # block-diag kernel at ViT-B/32 b512: 17.9 ms/stack vs 19.8 at 8 and
    # 28.5 at 16 — bigger blocks raise the block-diag core's wasted FLOPs
    # (∝ block_b) faster than the dense-matmul M helps. S > 128 towers run
    # one padded batch row per program (block_b=1, `_flat_want`).
    N, W = x2.shape
    B = N // S
    if block_b is None:
        block_b = _sublayer_block_b(B, S, want=_flat_want(S))
    M = block_b * S
    wqkv = attn_p["qkv"]["kernel"].astype(x2.dtype)
    wout = attn_p["out"]["kernel"].astype(x2.dtype)
    const = lambda b: (0,)
    out_specs = pl.BlockSpec((M, W), lambda b: (b, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((N, W), x2.dtype)
    if emit_qkv:
        out_specs = [out_specs,
                     pl.BlockSpec((M, 3 * W), lambda b: (b, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((N, 3 * W), x2.dtype)]

    def kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wout_ref,
               bout_ref, o_ref, *rest):
        _attn_sublayer_kernel(
            x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
            o_ref, rest[0] if rest else None, heads=heads, eps=eps,
            causal=causal, S=S, s_valid=s_valid,
            core_chunk=_core_chunk(S, block_b, bwd=False))

    return pl.pallas_call(
        kernel,
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec((M, W), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 3 * W), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, W), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_interpret_mode() if interpret is None else interpret,
    )(x2, ln_p["scale"], ln_p["bias"], wqkv,
      attn_p["qkv"]["bias"], wout, attn_p["out"]["bias"])


def _pallas_attn_sublayer(x, ln_p, attn_p, heads, causal, eps,
                          block_b: "int | None" = None,
                          interpret: "bool | None" = None):
    """[B, S, W] compatibility wrapper over the flat kernel. Prefer
    ``attention_sublayer_flat`` inside towers: the reshape here is a real
    tile-relayout copy on TPU ([B, 50, W] pads S to 56 sublanes in HBM)."""
    B, S, W = x.shape
    out = _pallas_attn_sublayer_flat(
        x.reshape(B * S, W), ln_p, attn_p, S, heads, causal, eps,
        block_b=block_b, interpret=interpret)
    return out.reshape(B, S, W)


def _jnp_attn_sublayer(x, ln_p, attn_p, heads, causal, eps,
                       s_valid: "int | None" = None):
    """Composed reference path (identical math). Uses fused_attention, so the
    attention core itself still takes the Pallas fwd/bwd on TPU — including
    PAD-column masking via ``s_valid`` (in-kernel iota compare), which keeps
    the composed padded path off the einsum [B, H, S, S] HBM round-trip."""
    from ..models.layers import layer_norm, linear

    qkv = linear(layer_norm(x, ln_p, eps), attn_p["qkv"])
    ctx = fused_attention(qkv, heads, causal, s_valid)
    return x + linear(ctx, attn_p["out"])


def _jnp_attn_sublayer_masked(x, ln_p, attn_p, heads, causal, eps,
                              s_valid: int):
    """Composed sublayer with PAD columns >= ``s_valid`` excluded — the
    reference semantics for a sequence padded S_real -> S. Parity ORACLE
    only (tests/test_padded_seq.py): production padded dispatch goes
    through ``_jnp_attn_sublayer`` + ``fused_attention``'s in-kernel
    s_valid masking instead. Same fp32 logits+softmax islands as the
    kernels."""
    from ..models.layers import layer_norm, linear

    B, S, W = x.shape
    D = W // heads
    qkv = linear(layer_norm(x, ln_p, eps), attn_p["qkv"])
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def split(t):
        return t.reshape(B, S, heads, D).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * (D ** -0.5)
    col = jnp.arange(S)
    mask = (col[None, :] < s_valid)
    mask = jnp.broadcast_to(mask, (S, S))
    if causal:
        mask = jnp.logical_and(mask, col[None, :] <= col[:, None])
    logits = jnp.where(mask[None, None], logits, -jnp.inf)
    p = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, W).astype(x.dtype)
    return x + linear(ctx, attn_p["out"])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def attention_sublayer(x, ln_p, attn_p, heads: int, causal: bool = False,
                       eps: float = 1e-5):
    """x + out_proj(attention(qkv_proj(LN(x)))) — one fused kernel on TPU,
    differentiable via a second hand-written Pallas kernel (`_sub_bwd`).

    Gated to S <= 128 (covers the CLIP family's 50/77-token sequences, where
    it wins +10% encode / +9% train); at S=257 (ViT-L/14) the composed path
    measured faster (792 vs 777 img/s), so longer sequences take that
    route — in both passes, since the gate in `_sub_bwd` mirrors this one.
    int8-quantized params (ops/quant.py, no ``kernel`` leaf) always take the
    composed path, whose `linear` dispatches to the W8A8 matmul."""
    if (_use_pallas() and x.shape[1] <= 128 and "kernel" in attn_p["qkv"]
            and _sublayer_block_b(x.shape[0], x.shape[1], 4) is not None):
        return _pallas_attn_sublayer(x, ln_p, attn_p, heads, causal, eps)
    return _jnp_attn_sublayer(x, ln_p, attn_p, heads, causal, eps)


def _core_fwd_bwd_block(qkv_b, dctx_b, mask, *, heads: int, D: int, W: int,
                        dtype, pipeline: bool):
    """Attention-core forward recompute + backward for one flat token block
    of the sublayer backward kernels (shared by the fused and dW-split
    variants — their bodies were identical).

    pipeline=False: the round-2 bit-exact schedule (normalize-first softmax,
    heads fully serialized).

    pipeline=True (the S > 128 default, mirroring the forward `_mha_kernel`
    gate): head h+1's logits recompute dot is issued before head h's VPU
    work, and every softmax divide is algebraically deferred out of the
    [M, M] intermediates into [M, D]/[M, 1] operands:

        e = exp(l - m);  denom = rowsum(e)          (P = e/denom)
        ctx = (e V)/denom
        dV  = eᵀ (g/denom)
        dsum_u = rowsum(dP ∘ e);  ds_u = e ∘ (dP − dsum_u/denom)
        dQ = (ds_u K)·scale/denom;   dK = ds_uᵀ (Q/denom)·scale

    Exact reassociation of the same math (measured r4: the serialized chain
    ran at MXU+VPU SUM; see bench_l14_pipe.py / PERF.md round 4)."""
    scale = D ** -0.5
    M = qkv_b.shape[0]

    def qk(h):
        q = qkv_b[:, h * D:(h + 1) * D]
        k = qkv_b[:, W + h * D:W + (h + 1) * D]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        return jnp.where(mask, logits, -jnp.inf)

    ctx_cols = [None] * heads
    dq_cols = [None] * heads
    dk_cols = [None] * heads
    dv_cols = [None] * heads

    def consume(h, logits):
        q = qkv_b[:, h * D:(h + 1) * D]
        k = qkv_b[:, W + h * D:W + (h + 1) * D]
        v = qkv_b[:, 2 * W + h * D:2 * W + (h + 1) * D]
        gh = dctx_b[:, h * D:(h + 1) * D]
        m = jnp.max(logits, -1, keepdims=True)
        e = jnp.exp(logits - m)
        if pipeline:
            denom = jnp.sum(e, -1, keepdims=True)
            e_c = e.astype(dtype)
            ctx_cols[h] = (
                jnp.dot(e_c, v, preferred_element_type=jnp.float32) / denom
            ).astype(dtype)
            ghn = (gh.astype(jnp.float32) / denom).astype(dtype)
            dv = jax.lax.dot_general(
                e_c, ghn, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                gh, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dsum_u = jnp.sum(dp * e, axis=-1, keepdims=True)
            ds_u = (e * (dp - dsum_u / denom)).astype(dtype)
            dq_cols[h] = (
                (jnp.dot(ds_u, k, preferred_element_type=jnp.float32)
                 * scale) / denom).astype(dtype)
            qn = (q.astype(jnp.float32) / denom).astype(dtype)
            dk_cols[h] = (
                jax.lax.dot_general(
                    ds_u, qn, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale).astype(dtype)
            dv_cols[h] = dv.astype(dtype)
        else:
            p = e / jnp.sum(e, -1, keepdims=True)  # fp32
            ctx_cols[h] = (
                jnp.dot(p.astype(dtype), v,
                        preferred_element_type=jnp.float32).astype(dtype)
            )
            p_c = p.astype(dtype)
            dv = jax.lax.dot_general(
                p_c, gh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                gh, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dsum = jnp.sum(dp * p, axis=-1, keepdims=True)
            ds = (p * (dp - dsum)).astype(dtype)  # zero where masked
            dq_cols[h] = (
                jnp.dot(ds, k, preferred_element_type=jnp.float32)
                * scale).astype(dtype)
            dk_cols[h] = (
                jax.lax.dot_general(
                    ds, q, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale).astype(dtype)
            dv_cols[h] = dv.astype(dtype)

    if pipeline:
        logits = qk(0)
        for h in range(heads):
            logits_next = qk(h + 1) if h + 1 < heads else None
            consume(h, logits)
            logits = logits_next
    else:
        for h in range(heads):
            consume(h, qk(h))
    return (jnp.concatenate(ctx_cols, axis=-1),
            jnp.concatenate(dq_cols + dk_cols + dv_cols, axis=-1))


# Trace-time overrides for the core schedules (None = auto: pipelined +
# deferred divides when S > 128; True/False force) — A/B harnesses:
# experiments/bench_bwd_pipe.py, bench_fwd_pipe.py.
_PIPE_BWD_OVERRIDE: "bool | None" = None
_PIPE_FWD_OVERRIDE: "bool | None" = None


def _pipe_bwd(S: int) -> bool:
    """Pipelined + deferred-divide backward core: ON everywhere. S > 128 is
    where it pays (L/14); at S <= 128 it measured a small consistent win too
    (B/32 b512 train 230.8 -> 229.5 ms, 3/3 interleaved rounds,
    experiments/bench_bwd_pipe.py r4)."""
    if _PIPE_BWD_OVERRIDE is not None:
        return bool(_PIPE_BWD_OVERRIDE)
    return True


def _pipe_fwd(S: int) -> bool:
    """Pipelined + deferred-divide schedule for the flat FWD sublayer core.
    S > 128 rows (B/16's 200, L/14's 264 when flat) get it by default; the
    short-S towers keep the round-2 bit-exact schedule until measured."""
    if _PIPE_FWD_OVERRIDE is not None:
        return bool(_PIPE_FWD_OVERRIDE)
    return S > 128


def _attn_sublayer_bwd_kernel(x_ref, g_ref, lns_ref, lnb_ref, wqkv_ref,
                              bqkv_ref, wout_ref, dx_ref, dlns_ref, dlnb_ref,
                              dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref, *,
                              heads: int, eps: float, causal: bool,
                              S: int, s_valid: "int | None" = None,
                              core_chunk: "int | None" = None):
    """Hand-written backward for the fused attention sublayer (VERDICT r1 #2).

    One program per batch-block: recomputes LN1/QKV/softmax in VMEM
    (flash-style — the only residual is x itself, so remat costs nothing
    extra), then runs the full chain rule

        dWout += ctxᵀ g;   dctx = g Woutᵀ
        per head: dV = Pᵀ dctx;  dP = dctx Vᵀ;  dS = P∘(dP − rowsum(dP∘P));
                  dQ = dS K·scale;  dK = dSᵀ Q·scale
        dWqkv += lnᵀ dqkv;  dln = dqkv Wqkvᵀ
        LN backward (fp32): dx̂ = dln·γ;  dx_ln = rstd·(dx̂ − mean(dx̂) −
                  x̂·mean(dx̂∘x̂));  dγ += Σ dln∘x̂;  dβ += Σ dln
        dx = g + dx_ln                               (residual)

    Weight/LN grads accumulate in fp32 VMEM across the sequential TPU grid
    (constant output index maps → the accumulator block never leaves VMEM);
    they are zeroed at program 0. This replaces round 1's `jax.vjp` fallback
    over the composed path, which re-ran the composed forward and made fused
    training *slower* than composed (PERF.md r1).

    Like the forward kernel, the program operates on a flat [M = block_b*S,
    W] token block (flattened outside the kernel) — dense matmuls (QKV
    recompute, dWout, dctx, dWqkv, dln, LN backward) run once per program at
    M rows, and the attention core fwd recompute + backward are
    block-diagonal [M, M] masked dots per head (exact: masked entries are
    0.0 in P and dS, contributing exact zeros to every contraction)."""
    M, W = x_ref.shape
    D = W // heads
    scale = D ** -0.5

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        dlns_ref[:] = jnp.zeros_like(dlns_ref)
        dlnb_ref[:] = jnp.zeros_like(dlnb_ref)
        dwqkv_ref[:, :] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[:] = jnp.zeros_like(dbqkv_ref)
        dwout_ref[:, :] = jnp.zeros_like(dwout_ref)
        dbout_ref[:] = jnp.zeros_like(dbout_ref)

    lns32 = lns_ref[:].astype(jnp.float32)
    lnb32 = lnb_ref[:].astype(jnp.float32)
    xb = x_ref[:]
    gyb = g_ref[:]
    # ---- recompute forward (identical math to _attn_sublayer_kernel)
    x32 = xb.astype(jnp.float32)
    mean = jnp.mean(x32, -1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), -1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x32 - mean) * rstd  # [M, W] fp32
    ln = (xhat * lns32 + lnb32).astype(xb.dtype)
    qkv = (
        jnp.dot(ln, wqkv_ref[:], preferred_element_type=jnp.float32)
        + bqkv_ref[:]
    ).astype(xb.dtype)
    # dctx for every row at once (one M-row dot), before the core loop
    dctx = jax.lax.dot_general(
        gyb, wout_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(xb.dtype)
    # chunked core — see _attn_sublayer_kernel / _core_chunk; fwd-recompute
    # + softmax/PV backward per token block via the shared core
    # (_core_fwd_bwd_block — pipelined schedule when S > 128)
    Mc = M if core_chunk is None else core_chunk * S
    mask = _blockdiag_mask(Mc, S, causal, s_valid)
    ctx_rows, dqkv_rows = [], []
    for rb in range(M // Mc):
        sl = slice(rb * Mc, (rb + 1) * Mc)
        c_rb, d_rb = _core_fwd_bwd_block(
            qkv[sl], dctx[sl], mask, heads=heads, D=D, W=W, dtype=xb.dtype,
            pipeline=_pipe_bwd(S))
        ctx_rows.append(c_rb)
        dqkv_rows.append(d_rb)
    ctx = ctx_rows[0] if len(ctx_rows) == 1 else jnp.concatenate(ctx_rows, 0)
    dqkv = (dqkv_rows[0] if len(dqkv_rows) == 1
            else jnp.concatenate(dqkv_rows, 0))
    # ---- dense backward, all rows at once
    dwout_ref[:, :] += jax.lax.dot_general(
        ctx, gyb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbout_ref[:] += jnp.sum(gyb.astype(jnp.float32), axis=0)
    dwqkv_ref[:, :] += jax.lax.dot_general(
        ln, dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbqkv_ref[:] += jnp.sum(dqkv.astype(jnp.float32), axis=0)
    dln = jax.lax.dot_general(
        dqkv, wqkv_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Bb*S, W] fp32
    dlns_ref[:] += jnp.sum(dln * xhat, axis=0)
    dlnb_ref[:] += jnp.sum(dln, axis=0)
    dxhat = dln * lns32
    dx_ln = rstd * (
        dxhat
        - jnp.mean(dxhat, -1, keepdims=True)
        - xhat * jnp.mean(dxhat * xhat, -1, keepdims=True)
    )
    dx_ref[:] = gyb + dx_ln.astype(xb.dtype)


def _attn_sublayer_bwd_split_kernel(x_ref, g_ref, lns_ref, lnb_ref, wqkv_ref,
                                    bqkv_ref, wout_ref, dx_ref, dqkv_out_ref,
                                    ctx_ref, ln_ref, dlns_ref, dlnb_ref, *,
                                    heads: int, eps: float, causal: bool,
                                    S: int, s_valid: "int | None" = None,
                                    core_chunk: "int | None" = None,
                                    qkv_ref=None):
    """dW-split backward: the kernel owns only the serial dx chain — dctx,
    the attention-core backward, dln, and the LN backward — and EMITS the
    operands XLA needs for the weight grads (ln, ctx, dqkv). The dWqkv/dWout
    matmuls then run as ordinary XLA dot+dynamic-update-slice fusions in the
    backward scan, exactly like the MLP half's dW, which the round-3
    profiler measured at ~90% of peak vs ~60-70% for the same matmuls
    inside this kernel's serial instruction stream. The extra [M, 5W]
    activation traffic is hidden: the kernel and the dW dots are both
    compute-bound at CLIP widths.

    With ``qkv_ref`` (save-qkv mode) the forward's QKV activations are read
    back instead of recomputed — removing the kernel's one remaining big
    matmul (3U = 2*M*W*3W) at +[N, 3W] bf16 of residual memory per layer."""
    M, W = x_ref.shape
    D = W // heads
    scale = D ** -0.5

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        dlns_ref[:] = jnp.zeros_like(dlns_ref)
        dlnb_ref[:] = jnp.zeros_like(dlnb_ref)

    lns32 = lns_ref[:].astype(jnp.float32)
    lnb32 = lnb_ref[:].astype(jnp.float32)
    xb = x_ref[:]
    gyb = g_ref[:]
    x32 = xb.astype(jnp.float32)
    mean = jnp.mean(x32, -1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), -1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x32 - mean) * rstd
    ln = (xhat * lns32 + lnb32).astype(xb.dtype)
    if qkv_ref is not None:
        qkv = qkv_ref[:]
    else:
        qkv = (
            jnp.dot(ln, wqkv_ref[:], preferred_element_type=jnp.float32)
            + bqkv_ref[:]
        ).astype(xb.dtype)
    dctx = jax.lax.dot_general(
        gyb, wout_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(xb.dtype)

    # chunked core — see _attn_sublayer_kernel / _core_chunk; shared core
    # with the pipelined S > 128 schedule (_core_fwd_bwd_block)
    Mc = M if core_chunk is None else core_chunk * S
    mask = _blockdiag_mask(Mc, S, causal, s_valid)
    ctx_rows, dqkv_rows = [], []
    for rb in range(M // Mc):
        sl = slice(rb * Mc, (rb + 1) * Mc)
        c_rb, d_rb = _core_fwd_bwd_block(
            qkv[sl], dctx[sl], mask, heads=heads, D=D, W=W, dtype=xb.dtype,
            pipeline=_pipe_bwd(S))
        ctx_rows.append(c_rb)
        dqkv_rows.append(d_rb)
    ctx = ctx_rows[0] if len(ctx_rows) == 1 else jnp.concatenate(ctx_rows, 0)
    dqkv = (dqkv_rows[0] if len(dqkv_rows) == 1
            else jnp.concatenate(dqkv_rows, 0))
    ctx_ref[:] = ctx
    ln_ref[:] = ln
    dqkv_out_ref[:] = dqkv
    dln = jax.lax.dot_general(
        dqkv, wqkv_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dlns_ref[:] += jnp.sum(dln * xhat, axis=0)
    dlnb_ref[:] += jnp.sum(dln, axis=0)
    dxhat = dln * lns32
    dx_ln = rstd * (
        dxhat
        - jnp.mean(dxhat, -1, keepdims=True)
        - xhat * jnp.mean(dxhat * xhat, -1, keepdims=True)
    )
    dx_ref[:] = gyb + dx_ln.astype(xb.dtype)


def _pallas_attn_sublayer_bwd_split(x2, g2, ln_p, attn_p, S, heads, causal,
                                    eps, block_b: "int | None" = None,
                                    interpret: "bool | None" = None,
                                    s_valid: "int | None" = None,
                                    qkv2=None):
    """Returns (dx2, dln_p, dattn_p) like `_pallas_attn_sublayer_bwd_flat`,
    but with the dWqkv/dWout matmuls done by XLA on kernel-emitted operands
    (see `_attn_sublayer_bwd_split_kernel`). ``qkv2``: forward-saved QKV
    activations (save-qkv mode) — skips the in-kernel QKV recompute."""
    N, W = x2.shape
    B = N // S
    if block_b is None:
        block_b = _sublayer_block_b(B, S, want=_flat_want(S))
    M = block_b * S
    wqkv = attn_p["qkv"]["kernel"].astype(x2.dtype)
    wout = attn_p["out"]["kernel"].astype(x2.dtype)
    const = lambda b: (0,)
    mat = lambda b: (0, 0)
    row = lambda b: (b, 0)
    f32 = jnp.float32
    in_specs = [
        pl.BlockSpec((M, W), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((M, W), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((W, 3 * W), mat, memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * W,), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((W, W), mat, memory_space=pltpu.VMEM),
    ]
    args = [x2, g2, ln_p["scale"], ln_p["bias"], wqkv,
            attn_p["qkv"]["bias"], wout]
    kern = functools.partial(
        _attn_sublayer_bwd_split_kernel, heads=heads, eps=eps, causal=causal,
        S=S, s_valid=s_valid, core_chunk=_core_chunk(S, block_b, bwd=True))
    if qkv2 is not None:
        in_specs.append(pl.BlockSpec((M, 3 * W), row, memory_space=pltpu.VMEM))
        args.append(qkv2)

        def kernel(x_ref, g_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                   wout_ref, qkv_ref, *out_refs):
            kern(x_ref, g_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                 wout_ref, *out_refs, qkv_ref=qkv_ref)
    else:
        kernel = kern
    dx, dqkv, ctx, ln, dlns, dlnb = pl.pallas_call(
        kernel,
        grid=(B // block_b,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((M, W), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 3 * W), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((M, W), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((M, W), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, W), x2.dtype),
            jax.ShapeDtypeStruct((N, 3 * W), x2.dtype),
            jax.ShapeDtypeStruct((N, W), x2.dtype),
            jax.ShapeDtypeStruct((N, W), x2.dtype),
            jax.ShapeDtypeStruct((W,), f32),
            jax.ShapeDtypeStruct((W,), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=_interpret_mode() if interpret is None else interpret,
    )(*args)
    # Weight grads as plain XLA dots (dot + DUS fusions in the bwd scan,
    # ~90% of peak); fp32 accumulation matches the fused kernel's.
    dwqkv = jax.lax.dot_general(
        ln, dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbqkv = jnp.sum(dqkv.astype(jnp.float32), axis=0)
    dwout = jax.lax.dot_general(
        ctx, g2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbout = jnp.sum(g2.astype(jnp.float32), axis=0)
    pdt = ln_p["scale"].dtype
    dln_p = {"scale": dlns.astype(pdt), "bias": dlnb.astype(pdt)}
    dattn_p = {
        "qkv": {"kernel": dwqkv.astype(attn_p["qkv"]["kernel"].dtype),
                "bias": dbqkv.astype(attn_p["qkv"]["bias"].dtype)},
        "out": {"kernel": dwout.astype(attn_p["out"]["kernel"].dtype),
                "bias": dbout.astype(attn_p["out"]["bias"].dtype)},
    }
    return dx, dln_p, dattn_p


def _pallas_attn_sublayer_bwd_flat(x2, g2, ln_p, attn_p, S, heads, causal,
                                   eps, block_b: "int | None" = None,
                                   interpret: "bool | None" = None,
                                   s_valid: "int | None" = None):
    """Returns (dx2, dln_p, dattn_p) with fp32 weight grads (param dtype);
    dx2 is flat [N, W] like the inputs."""
    N, W = x2.shape
    B = N // S
    if block_b is None:
        block_b = _sublayer_block_b(B, S, want=_flat_want(S))
    M = block_b * S
    wqkv = attn_p["qkv"]["kernel"].astype(x2.dtype)
    wout = attn_p["out"]["kernel"].astype(x2.dtype)
    const = lambda b: (0,)
    mat = lambda b: (0, 0)
    f32 = jnp.float32
    dx, dlns, dlnb, dwqkv, dbqkv, dwout, dbout = pl.pallas_call(
        functools.partial(_attn_sublayer_bwd_kernel, heads=heads, eps=eps,
                          causal=causal, S=S, s_valid=s_valid,
                          core_chunk=_core_chunk(S, block_b, bwd=True)),
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec((M, W), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, W), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 3 * W), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, W), mat, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((M, W), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 3 * W), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * W,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, W), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, W), x2.dtype),
            jax.ShapeDtypeStruct((W,), f32),
            jax.ShapeDtypeStruct((W,), f32),
            jax.ShapeDtypeStruct((W, 3 * W), f32),
            jax.ShapeDtypeStruct((3 * W,), f32),
            jax.ShapeDtypeStruct((W, W), f32),
            jax.ShapeDtypeStruct((W,), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=_interpret_mode() if interpret is None else interpret,
    )(x2, g2, ln_p["scale"], ln_p["bias"],
      wqkv, attn_p["qkv"]["bias"], wout)
    pdt = ln_p["scale"].dtype
    dln_p = {"scale": dlns.astype(pdt), "bias": dlnb.astype(pdt)}
    dattn_p = {
        "qkv": {"kernel": dwqkv.astype(attn_p["qkv"]["kernel"].dtype),
                "bias": dbqkv.astype(attn_p["qkv"]["bias"].dtype)},
        "out": {"kernel": dwout.astype(attn_p["out"]["kernel"].dtype),
                "bias": dbout.astype(attn_p["out"]["bias"].dtype)},
    }
    return dx, dln_p, dattn_p


def _pallas_attn_sublayer_bwd(x, g, ln_p, attn_p, heads, causal, eps,
                              block_b: "int | None" = None,
                              interpret: "bool | None" = None):
    """[B, S, W] compatibility wrapper over the flat backward kernel."""
    B, S, W = x.shape
    dx, dln_p, dattn_p = _pallas_attn_sublayer_bwd_flat(
        x.reshape(B * S, W), g.reshape(B * S, W), ln_p, attn_p, S, heads,
        causal, eps, block_b=block_b, interpret=interpret)
    return dx.reshape(B, S, W), dln_p, dattn_p


def _sub_fwd(x, ln_p, attn_p, heads, causal, eps):
    return attention_sublayer(x, ln_p, attn_p, heads, causal, eps), (x, ln_p, attn_p)


def _sub_bwd(heads, causal, eps, res, g):
    x, ln_p, attn_p = res
    if (_use_pallas() and x.shape[1] <= 128 and "kernel" in attn_p["qkv"]
            and _sublayer_block_b(x.shape[0], x.shape[1], 4) is not None):
        # Same barrier as _sub_flat_bwd: without it XLA fuses a scan's
        # dynamic-update-slice dW accumulation into the pallas-call fusion
        # and blows the 16 MB scoped-vmem limit at W=512 (compile-time OOM).
        return jax.lax.optimization_barrier(
            _pallas_attn_sublayer_bwd(x, g, ln_p, attn_p, heads, causal, eps))
    _, vjp = jax.vjp(
        lambda a, b, c: _jnp_attn_sublayer(a, b, c, heads, causal, eps),
        x, ln_p, attn_p,
    )
    return vjp(g)


attention_sublayer.defvjp(_sub_fwd, _sub_bwd)


# ---------------------------------------------------------------------------
# Flat-token sublayer entry point: [N = B*S, W] in/out, no per-layer reshapes.
# The towers flatten ONCE before their scan and unflatten after
# (models/layers.transformer) — on TPU a [B, 50, W] HBM buffer pads S to 56
# sublane-tiles, so every [B,S,W]<->[N,W] reshape is a real relayout copy
# (~2x39 MB/layer at ViT-B/32 b512) AND every elementwise/matmul op on the
# 3D form drags ~12% padded bandwidth. Measured: the flat block-diag kernel
# saved 2.1 ms/stack in isolation but nothing end-to-end until the tower
# went flat.
# ---------------------------------------------------------------------------


def _flat_pallas_ok(N: int, S: int, attn_p) -> bool:
    # S <= _MAX_FLAT_M: block_b=1 above 128 keeps the [M, M] bwd working
    # set small (the picker itself caps bb*S at _MAX_FLAT_M) — covers the
    # whole CLIP family up to ViT-L/14@336px (S=577 -> 584 padded).
    # Geometries with no legal block (e.g. unpadded S=197) return None from
    # the picker and run composed — models/layers.transformer pads S to
    # reopen this gate.
    return (_use_pallas() and S <= _MAX_FLAT_M and "kernel" in attn_p["qkv"]
            and _sublayer_block_b(N // S, S, _flat_want(S)) is not None)


def _jnp_sublayer_flat_dispatch(x2, ln_p, attn_p, S, heads, causal, eps,
                                s_valid):
    N, W = x2.shape
    x3 = x2.reshape(N // S, S, W)
    out = _jnp_attn_sublayer(x3, ln_p, attn_p, heads, causal, eps, s_valid)
    return out.reshape(N, W)


# Backward formulation for the flat sublayer (trace-time policy):
#   "fused"          — one Pallas kernel owns dx AND the dWqkv/dWout matmuls
#                      (fp32 accumulators in VMEM across the grid)
#   "dwsplit"        — kernel owns only the serial dx chain and emits
#                      (ln, ctx, dqkv); XLA runs the dW matmuls
#   "dwsplit_saveqkv"— dwsplit + the forward saves QKV activations so the
#                      backward kernel skips its recompute matmul
#                      (+[N, 3W] bf16 residual memory per layer)
_BWD_MODE = "fused"

# Training-forward formulation for wide towers (trace-time policy; None =
# default rule below, True/False force). The fused flat fwd kernel measured
# SLOWER than the composed XLA path at W=1024 forward-only (L/14 encode 75.6
# vs 77.5 ms — models/layers._FLAT_FWD_ONLY_MAX_W); the custom-VJP boundary
# makes the passes independent, so training can take the composed forward
# (XLA dense at ~90% + per-row Pallas core, s_valid-masked) while keeping
# the flat Pallas backward kernel. Legal whenever S % 8 == 0 (the
# [N, W] <-> [B, S, W] reshape is layout-free) AND S <= 512: above 512 the
# composed path's fused_attention falls off the per-row Pallas core (the
# only kernel with s_valid masking) onto the _jnp_mha einsum, i.e. the
# [B, H, S, S] HBM round-trip the hybrid exists to avoid — so L/14@336px
# (S padded to 584) keeps the all-flat training forward.
_TRAIN_FWD_COMPOSED_OVERRIDE: "bool | None" = None


def _train_fwd_composed(W: int, S: int) -> bool:
    legal = S % 8 == 0 and S <= 512
    if _TRAIN_FWD_COMPOSED_OVERRIDE is not None:
        return bool(_TRAIN_FWD_COMPOSED_OVERRIDE) and legal
    return W > 768 and legal


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def attention_sublayer_flat(x2, ln_p, attn_p, S: int, heads: int,
                            causal: bool = False, eps: float = 1e-5,
                            s_valid: "int | None" = None):
    """``attention_sublayer`` on flat [N, W] tokens (N = B*S, batch-major).

    ``s_valid``: treat within-row positions >= s_valid as PAD — excluded as
    attention columns, so real-token outputs are bit-exact vs the unpadded
    sequence (pad rows produce garbage the caller slices away).

    Same dispatch rules as the 3D form; the jnp fallback reshapes to
    [B, S, W] (free outside TPU tiled layouts) and runs the composed path."""
    if _flat_pallas_ok(x2.shape[0], S, attn_p):
        return _pallas_attn_sublayer_flat(x2, ln_p, attn_p, S, heads,
                                          causal, eps, s_valid=s_valid)
    return _jnp_sublayer_flat_dispatch(x2, ln_p, attn_p, S, heads, causal,
                                       eps, s_valid)


def _sub_flat_fwd(x2, ln_p, attn_p, S, heads, causal, eps, s_valid):
    if _flat_pallas_ok(x2.shape[0], S, attn_p):
        if _BWD_MODE == "dwsplit_saveqkv":
            out, qkv = _pallas_attn_sublayer_flat(
                x2, ln_p, attn_p, S, heads, causal, eps, s_valid=s_valid,
                emit_qkv=True)
            return out, (x2, qkv, ln_p, attn_p)
        if _train_fwd_composed(x2.shape[1], S):
            # Hybrid: composed forward (its measured winner at this width)
            # with the flat Pallas kernel still owning the backward.
            out = _jnp_sublayer_flat_dispatch(x2, ln_p, attn_p, S, heads,
                                              causal, eps, s_valid)
            return out, (x2, None, ln_p, attn_p)
    return (attention_sublayer_flat(x2, ln_p, attn_p, S, heads, causal, eps,
                                    s_valid),
            (x2, None, ln_p, attn_p))


def _sub_flat_bwd(S, heads, causal, eps, s_valid, res, g):
    x2, qkv2, ln_p, attn_p = res
    if _flat_pallas_ok(x2.shape[0], S, attn_p):
        if _BWD_MODE == "fused":
            out = _pallas_attn_sublayer_bwd_flat(
                x2, g, ln_p, attn_p, S, heads, causal, eps, s_valid=s_valid)
        else:
            out = _pallas_attn_sublayer_bwd_split(
                x2, g, ln_p, attn_p, S, heads, causal, eps, s_valid=s_valid,
                qkv2=qkv2)
        # Barrier between the kernel's weight-grad outputs and the scan's
        # dynamic-update-slice accumulation: without it XLA fuses the DUS
        # into the pallas-call fusion and the fused scoped allocation
        # ([L, W, W] fp32 accumulator + kernel outputs) exceeds the 16 MB
        # scoped-vmem limit at the text tower's W=512 (compile-time OOM).
        return jax.lax.optimization_barrier(out)

    _, vjp = jax.vjp(
        lambda a, b, c: _jnp_sublayer_flat_dispatch(a, b, c, S, heads,
                                                    causal, eps, s_valid),
        x2, ln_p, attn_p,
    )
    return vjp(g)


attention_sublayer_flat.defvjp(_sub_flat_fwd, _sub_flat_bwd)
