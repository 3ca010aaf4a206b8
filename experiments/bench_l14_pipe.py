"""Head-loop scheduling variants for the S=257 per-row attention core: can
explicit software pipelining (issue head h+1's QK dot before head h's
softmax/PV) get Mosaic to overlap MXU and VPU? Measured base = MXU+VPU sum
(~3.44 ms/call incl. ~2.3 ms chain overhead), ideal = max(MXU, VPU)."""

import functools

from _harness import setup, chain, interleave

setup()

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from plip_tpu.ops.attention import _pallas_mha

B, S, HEADS, D = 128, 257, 16, 64
W = HEADS * D
ITERS = 20


def _slices(qkv, h):
    q = qkv[:, h * D:(h + 1) * D]
    k = qkv[:, W + h * D:W + (h + 1) * D]
    v = qkv[:, 2 * W + h * D:2 * W + (h + 1) * D]
    return q, k, v


def _qk(qkv, h):
    q, k, _ = _slices(qkv, h)
    qs = (q.astype(jnp.float32) * (D ** -0.5)).astype(qkv.dtype)
    return jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _sm_pv(qkv, logits, h, defer):
    _, _, v = _slices(qkv, h)
    m = jnp.max(logits, -1, keepdims=True)
    p = jnp.exp(logits - m)
    if defer:
        denom = jnp.sum(p, -1, keepdims=True)
        return jnp.dot(p.astype(qkv.dtype), v,
                       preferred_element_type=jnp.float32) / denom
    p = p / jnp.sum(p, -1, keepdims=True)
    return jnp.dot(p.astype(qkv.dtype), v,
                   preferred_element_type=jnp.float32)


def _kernel(qkv_ref, o_ref, *, mode):
    qkv = qkv_ref[0]
    if mode in ("base", "defer"):
        for h in range(HEADS):
            ctx = _sm_pv(qkv, _qk(qkv, h), h, mode == "defer")
            o_ref[0, :, h * D:(h + 1) * D] = ctx.astype(o_ref.dtype)
    elif mode == "pipe":  # issue next head's dot before this head's softmax
        l = _qk(qkv, 0)
        for h in range(HEADS):
            l_next = _qk(qkv, h + 1) if h + 1 < HEADS else None
            ctx = _sm_pv(qkv, l, h, True)
            o_ref[0, :, h * D:(h + 1) * D] = ctx.astype(o_ref.dtype)
            l = l_next
    elif mode == "pipe2":  # two QK dots in flight
        ls = [_qk(qkv, 0), _qk(qkv, 1)]
        for h in range(HEADS):
            if h + 2 < HEADS:
                ls.append(_qk(qkv, h + 2))
            ctx = _sm_pv(qkv, ls[h], h, True)
            o_ref[0, :, h * D:(h + 1) * D] = ctx.astype(o_ref.dtype)
    elif mode == "pipe_nodefer":  # pipeline without the deferred divide
        l = _qk(qkv, 0)
        for h in range(HEADS):
            l_next = _qk(qkv, h + 1) if h + 1 < HEADS else None
            ctx = _sm_pv(qkv, l, h, False)
            o_ref[0, :, h * D:(h + 1) * D] = ctx.astype(o_ref.dtype)
            l = l_next
    elif mode == "pairs":  # group dots, then softmaxes, then PVs, per pair
        for h in range(0, HEADS, 2):
            la, lb = _qk(qkv, h), _qk(qkv, h + 1)
            ca = _sm_pv(qkv, la, h, True)
            cb = _sm_pv(qkv, lb, h + 1, True)
            o_ref[0, :, h * D:(h + 1) * D] = ca.astype(o_ref.dtype)
            o_ref[0, :, (h + 1) * D:(h + 2) * D] = cb.astype(o_ref.dtype)


def run(qkv, mode):
    return pl.pallas_call(
        functools.partial(_kernel, mode=mode),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, S, 3 * W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, S, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, W), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(qkv)


def main():
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(
        rng.standard_normal((B, S, 3 * W)).astype(np.float32) * 0.05
    ).astype(jnp.bfloat16)
    ref = np.asarray(_pallas_mha(qkv, HEADS, False, block_b=1), np.float32)
    for mode in ("pipe", "pipe2", "pipe_nodefer"):
        got = np.asarray(run(qkv, mode), np.float32)
        print(f"{mode} parity max|diff| = {np.abs(ref - got).max():.2e}",
              flush=True)
    variants = {m: (lambda mm: (lambda x: run(x, mm)))(m)
                for m in ("base", "pipe", "pipe2", "pipe_nodefer")}
    runners = {n: (lambda r: (lambda: r(qkv)))(chain(f, ITERS))
               for n, f in variants.items()}
    best, _ = interleave(runners, rounds=3)
    for n in variants:
        ms = best[n] / ITERS * 1e3
        print(f"{n:6s} {ms:7.3f} ms/call -> {24 * ms:6.1f} ms/24-layer",
              flush=True)


if __name__ == "__main__":
    main()
