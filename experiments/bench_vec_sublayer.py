"""Measure the batch-vectorized fused attention-sublayer kernels (fwd/bwd).

The vectorized kernels unroll (block_b x heads) core dots into one program,
so their Mosaic compile is slow (~1.5-5 min); every timing here passes the
iteration count as a TRACED scalar so each variant compiles exactly once.

Usage:
  python -u experiments/bench_vec_sublayer.py fwd 8 16 32
  python -u experiments/bench_vec_sublayer.py bwd 8 16
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp

from plip_tpu.models.layers import init_block_stack
from plip_tpu.ops.attention import (_pallas_attn_sublayer,
                                    _pallas_attn_sublayer_bwd)

B, S, W, L, HEADS = 512, 50, 768, 12, 12


def force(g):
    return sum(jnp.sum(leaf) for leaf in jax.tree.leaves(g))


def main():
    mode = sys.argv[1]
    blocks = [int(a) for a in sys.argv[2:]] or [8]
    params = init_block_stack(jax.random.PRNGKey(0), L, W)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, S, W)).astype(np.float32),
                    jnp.bfloat16)

    for block_b in blocks:
        if mode == "bwd":
            def body(hc, lp, _bb=block_b):
                dx, dl, da = _pallas_attn_sublayer_bwd(
                    hc, hc, lp["ln1"], lp["attn"], HEADS, False, 1e-5,
                    block_b=_bb)
                return dx + (force((dl, da)) * 1e-20).astype(hc.dtype), None
        else:
            def body(hc, lp, _bb=block_b):
                return _pallas_attn_sublayer(
                    hc, lp["ln1"], lp["attn"], HEADS, False, 1e-5,
                    block_b=_bb), None

        @jax.jit
        def chain(p, h, n, _body=body):
            def it(_, hc):
                out, _n = jax.lax.scan(_body, hc, p)
                return hc + (jnp.sum(out.astype(jnp.float32)) * 1e-20
                             ).astype(hc.dtype)

            h2 = jax.lax.fori_loop(0, n, it, h)
            return jnp.sum(h2[0, 0].astype(jnp.float32))

        try:
            t0 = time.perf_counter()
            float(chain(params, x, jnp.int32(2)))
            print(f"block_b={block_b:3d} {mode}: compile+warm "
                  f"{time.perf_counter()-t0:.0f}s", flush=True)
            t0 = time.perf_counter()
            float(chain(params, x, jnp.int32(10)))
            dt = (time.perf_counter() - t0) / 10
            print(f"block_b={block_b:3d} {mode}: {dt*1e3:6.1f} ms "
                  f"for the 12-layer stack", flush=True)
        except Exception as e:
            print(f"block_b={block_b:3d} {mode}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
