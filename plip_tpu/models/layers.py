"""Core transformer layers — pure-functional JAX, TPU-first.

Design notes (why this is not a torch translation):

- Parameters for all L transformer blocks are stacked on a leading axis and
  the stack is consumed with ``lax.scan`` — one compiled block body instead of
  L unrolled copies (faster XLA compiles, natural remat boundary, and the
  idiomatic way to pipeline-parallelize later).
- LayerNorm and softmax always accumulate in fp32 regardless of the compute
  dtype; matmuls request ``preferred_element_type=float32`` so the MXU
  accumulates in fp32 even for bf16 inputs. This is what replaces the
  reference's fp16↔fp32 weight-swap dance
  (`/root/reference/reproducibility/training_model/clip.py:197-202`).
- Attention uses a fused QKV projection (one big MXU matmul) rather than
  separate q/k/v projections.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """QuickGELU: x * sigmoid(1.702 x) — the CLIP activation (SURVEY §7)."""
    return x * jax.nn.sigmoid(1.702 * x)


def layer_norm(x: jnp.ndarray, p: Params, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm with fp32 statistics, output cast back to input dtype."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


def linear(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """x @ kernel + bias.

    The MXU accumulates in fp32 internally regardless; emitting the compute
    dtype directly halves intermediate-activation bandwidth in bf16 mode
    (+5% end-to-end encode, tower cosine vs full-fp32 stays ≥ 0.9999).

    Params produced by ``ops.quant.quantize_block_linears`` (``kernel_q``
    present) dispatch to the int8 W8A8 path — +14% at ViT-L/14 (PERF.md).
    """
    if "kernel_q" in p:
        from ..ops.quant import linear_w8a8

        return linear_w8a8(x, p)
    y = jnp.dot(x, p["kernel"].astype(x.dtype), preferred_element_type=x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def attention(
    x: jnp.ndarray,
    p: Params,
    heads: int,
    causal: bool = False,
) -> jnp.ndarray:
    """Multi-head self-attention with fused QKV.

    x: [B, S, W]; p: {qkv: {kernel [W, 3W], bias}, out: {kernel [W, W], bias}}

    The attention core runs as a fused Pallas kernel on TPU (logits stay in
    VMEM; see ops/attention.py) and as the equivalent jnp formulation
    elsewhere — fp32 logits + softmax island in both.
    """
    from ..ops.attention import fused_attention

    qkv = linear(x, p["qkv"])  # [B, S, 3W]
    ctx = fused_attention(qkv, heads, causal)
    return linear(ctx, p["out"])


ACTIVATIONS = {
    "quick_gelu": quick_gelu,
    # erf-exact GELU — torch.nn.GELU's default, which the torchvision ViT
    # towers use; jax.nn.gelu defaults to the tanh approximation.
    "gelu": functools.partial(jax.nn.gelu, approximate=False),
    "relu": jax.nn.relu,
}


def mlp(x: jnp.ndarray, p: Params, act: str = "quick_gelu") -> jnp.ndarray:
    return linear(ACTIVATIONS[act](linear(x, p["fc1"])), p["fc2"])


def block(
    x: jnp.ndarray,
    p: Params,
    heads: int,
    causal: bool = False,
    eps: float = 1e-5,
    act: str = "quick_gelu",
    fused_sublayer: bool = True,
    mlp_remat: bool = False,
) -> jnp.ndarray:
    """Pre-LN transformer block (residual → attn, residual → MLP).

    With ``fused_sublayer`` the whole attention sublayer
    (LN1+QKV+attention+out-proj+residual) runs as one fused Pallas kernel on
    TPU (+8% encode; bit-identical), and since round 2 its BACKWARD is a
    hand-written Pallas kernel too (dx + fp32 weight-grad accumulators in
    VMEM, ops/attention.py `_pallas_attn_sublayer_bwd`) — so training also
    takes the fused path: 1,830 vs 1,675 pairs/s at batch 512 under remat
    (round 1 kept the composed path because the then-fallback VJP re-ran the
    composed forward and measured slower). The MLP half stays XLA either way
    (its fused variant measured slower — see PERF.md)."""
    if fused_sublayer:
        from ..ops.attention import attention_sublayer

        x = attention_sublayer(x, p["ln1"], p["attn"], heads, causal, eps)
    else:
        x = x + attention(layer_norm(x, p["ln1"], eps), p["attn"], heads, causal)
    if mlp_remat:
        # checkpoint ONLY the MLP half: its fc1 activations ([B, S, 4W]) are
        # the bulk of a block's residuals, while the attention sublayer's
        # custom VJP already saves nothing but its input
        half = jax.checkpoint(
            lambda a, ln2, pm: a + mlp(layer_norm(a, ln2, eps), pm, act))
        return half(x, p["ln2"], p["mlp"])
    return x + mlp(layer_norm(x, p["ln2"], eps), p["mlp"], act)


# Widest tower where the padded flat path wins FORWARD-ONLY dispatch at
# S > 128 (measured: W=768 B/16 +12%, W=1024 L/14 -3..-7% vs composed —
# experiments/bench_bb_sweep.py). Training takes the flat path at any width
# where it fits (its hand-written bwd kernel wins at L/14 too).
_FLAT_FWD_ONLY_MAX_W = 768

# Layer-scan unroll factor (trace-time experiment knob, VERDICT r3 #2): the
# VJP of an unrolled scan is an unrolled scan, so unroll=k puts k layers'
# backward in one XLA block — letting layer l's dW matmuls overlap layer
# l+1's attn-bwd Pallas kernel across the old iteration boundary
# (experiments/bench_b32_sched.py measures {fused, dwsplit} x {1, 2}).
_SCAN_UNROLL = 1


def transformer(
    x: jnp.ndarray,
    stacked: Params,
    heads: int,
    causal: bool = False,
    eps: float = 1e-5,
    remat: "bool | str" = False,
    act: str = "quick_gelu",
) -> jnp.ndarray:
    """Run a stack of blocks whose params have a leading layer axis, via scan.

    Training memory/speed trade (measured on v5e, PERF.md round 2):

    - ``remat=True``: whole-block jax.checkpoint — smallest footprint (one
      [B,S,W] carry per layer), recomputes the full block in the backward.
    - ``remat="mlp"``: checkpoint only the MLP half. The fused attention
      sublayer's custom VJP saves nothing but its input anyway, so this
      keeps ~2×[B,S,W] per layer while skipping the attention-sublayer
      recompute — faster than full remat wherever it fits.
    - ``remat=False``: no checkpointing (the [B,S,4W] fc1 activations
      dominate; OOMs at batch ≥256 full-step on one v5e chip).

    All paths use the fused attention-sublayer kernel (its custom VJP is a
    second Pallas kernel — measured +9% train throughput over composed).

    The scan runs on FLAT [B*S, W] tokens when the fused kernel is usable:
    on TPU a [B, 50, W] HBM buffer pads S to 56-sublane tiles, so keeping
    the 3D shape taxes every op with ~12% padded bandwidth and each
    kernel-boundary reshape is a relayout copy. LN/MLP/linear are per-token
    and shape-agnostic; the flat fused kernel handles attention's S
    structure block-diagonally (ops/attention.py). Composed-path models
    (S > 128, int8) keep the 3D scan."""
    from ..ops.attention import _flat_pallas_ok, attention_sublayer_flat

    B, S, W = x.shape
    first = jax.tree.map(lambda a: a[0], stacked["attn"])

    # Long/odd-S geometries (ViT-B/16's 197, ViT-L/14's 257) have no legal
    # flat block unpadded; padding the token dim to a multiple of 8 reopens
    # the fused path with block_b=1 and `s_valid` masking pad columns out of
    # attention — real-token outputs are bit-exact vs the unpadded sequence
    # (ops/attention._blockdiag_mask), and the pad rows' grads are exactly
    # zero, so weight grads are unpolluted. Measured-optimal short-S paths
    # (50, 80) are untouched: padding only happens when the unpadded gate
    # fails. (With the round-3 row-blocked core, block_b no longer costs
    # core waste at S > 128, so dense ops run at M = bb*S rows in the
    # kernels — measured A/Bs in experiments/bench_l14_ab.py.)
    #
    # Per-pass dispatch at S > 128 (measured, v5e, experiments/bench_l14_ab
    # + bench_bb_sweep): the padded flat path wins BOTH passes at W=768
    # (B/16 encode 62.6 vs 70.3 ms b256) and wins TRAINING at W=1024 (L/14
    # 333.2 vs 341.1 ms b64) but loses forward-only there (77.5+ vs 75.6 ms
    # — the 16-head × block_b row-blocked core serializes more than the 3D
    # fused_attention kernel at that width). `remat` is the training proxy:
    # inference calls pass remat=False, so the composed 3D scan keeps
    # forward-only W>768 towers on their measured winner. Inside the flat
    # TRAINING path, W>768 towers additionally take the hybrid forward
    # (composed XLA fwd under the flat custom VJP — 330.2 ms, another
    # +2.6%; ops/attention._train_fwd_composed).
    S_run, s_valid = S, None
    flat_fwd_only_wins = W <= _FLAT_FWD_ONLY_MAX_W
    if not _flat_pallas_ok(B * S, S, first):
        S_pad = -(-S // 8) * 8
        if _flat_pallas_ok(B * S_pad, S_pad, first) and (
                remat is not False or flat_fwd_only_wins):
            S_run, s_valid = S_pad, S

    def _flatten(h):
        if s_valid is not None:
            h = jnp.pad(h, ((0, 0), (0, S_run - S), (0, 0)))
        return h.reshape(B * S_run, W)

    def _unflatten(h2):
        h = h2.reshape(B, S_run, W)
        return h if s_valid is None else h[:, :S]

    if remat == "block":
        # Whole-block custom VJP (ops/block_bwd.py): forward is the same
        # fused-attn + XLA-MLP split as below; backward is ONE Pallas kernel
        # per batch-block owning both halves (VERDICT r2 #1). Saves only the
        # block input per layer — less memory than remat="mlp". Off-TPU (or
        # non-quick-gelu / int8) block_flat itself falls back to the
        # composed VJP, so the policy is valid everywhere.
        from ..ops.block_bwd import block_flat

        def body(h, p):
            return block_flat(h, p, S_run, heads, causal, eps, act,
                              s_valid), None

        out, _ = jax.lax.scan(body, _flatten(x), stacked)
        return _unflatten(out)
    if _flat_pallas_ok(B * S_run, S_run, first):
        # The MLP half deliberately stays XLA in BOTH passes. The fused MLP
        # backward kernel (ops/mlp.py) wins 24% ISOLATED (46.3 vs 61.3
        # ms/stack at its best block_b=16) but loses ~2% in the full train
        # step (2,131-2,156 vs 2,191 pairs/s): XLA overlaps the MLP's HBM
        # traffic with the adjacent attention kernels' execution, which
        # back-to-back Pallas calls cannot. Same pattern as the fused MLP
        # forward and whole-block kernels (PERF.md).
        def body(h, p):
            h = attention_sublayer_flat(h, p["ln1"], p["attn"], S_run, heads,
                                        causal, eps, s_valid)
            half = lambda a, ln2, pm: a + mlp(layer_norm(a, ln2, eps), pm, act)
            if remat == "mlp":
                half = jax.checkpoint(half)
            elif remat == "mlp_h1":
                # Save ONLY the fc1 pre-activation: the backward recomputes
                # just LN2 + the activation (cheap VPU) instead of the fc1
                # matmul remat="mlp" re-runs (2*N*W*4W FLOPs/layer), at
                # +[N, 4W] bf16 per layer of residual memory.
                from jax.ad_checkpoint import checkpoint_name

                def half(a, ln2, pm):
                    h1 = checkpoint_name(
                        linear(layer_norm(a, ln2, eps), pm["fc1"]), "mlp_h1")
                    return a + linear(ACTIVATIONS[act](h1), pm["fc2"])

                half = jax.checkpoint(
                    half,
                    policy=jax.checkpoint_policies.save_only_these_names(
                        "mlp_h1"),
                )
            return half(h, p["ln2"], p["mlp"]), None

        if remat is True:
            body = jax.checkpoint(body)
        out, _ = jax.lax.scan(body, _flatten(x), stacked,
                              unroll=_SCAN_UNROLL)
        return _unflatten(out)

    def body(h, layer_params):
        return block(h, layer_params, heads, causal, eps, act,
                     fused_sublayer=True, mlp_remat=remat == "mlp"), None

    if remat is True:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, stacked, unroll=_SCAN_UNROLL)
    return x


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _init_linear(key, d_in, d_out, std):
    kkey, _ = jax.random.split(key)
    return {
        "kernel": jax.random.normal(kkey, (d_in, d_out), jnp.float32) * std,
        "bias": jnp.zeros((d_out,), jnp.float32),
    }


def _init_ln(width):
    return {"scale": jnp.ones((width,), jnp.float32), "bias": jnp.zeros((width,), jnp.float32)}


def init_block_stack(key, layers: int, width: int) -> Params:
    """OpenAI-CLIP initialization scheme, stacked on a leading layer axis."""
    proj_std = (width ** -0.5) * ((2 * layers) ** -0.5)
    attn_std = width ** -0.5
    fc_std = (2 * width) ** -0.5

    def init_one(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        return {
            "ln1": _init_ln(width),
            "attn": {
                "qkv": _init_linear(k1, width, 3 * width, attn_std),
                "out": _init_linear(k2, width, width, proj_std),
            },
            "ln2": _init_ln(width),
            "mlp": {
                "fc1": _init_linear(k3, width, 4 * width, fc_std),
                "fc2": _init_linear(k4, 4 * width, width, proj_std),
            },
        }

    keys = jax.random.split(key, layers)
    per_layer = [init_one(k) for k in keys]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)
