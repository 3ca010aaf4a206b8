"""Isolated MLP-half backward: Pallas kernel (block_b sweep) vs composed
remat='mlp' XLA path, 12-layer ViT-B/32 vision stack at b512.

Usage: python -u experiments/bench_mlp_bwd.py 4 8 16   (block sizes)
       python -u experiments/bench_mlp_bwd.py composed
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp

from plip_tpu.models.layers import init_block_stack, layer_norm, mlp
from plip_tpu.ops.mlp import _pallas_mlp_bwd_flat

B, S, W, L = 512, 50, 768, 12
N = B * S


def force(g):
    return sum(jnp.sum(leaf) for leaf in jax.tree.leaves(g))


def main():
    args = sys.argv[1:] or ["4", "8"]
    params = init_block_stack(jax.random.PRNGKey(0), L, W)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, W)).astype(np.float32),
                    jnp.bfloat16)

    for arg in args:
        if arg == "composed":
            def body(hc, lp):
                half = jax.checkpoint(
                    lambda a, ln2, pm: a + mlp(layer_norm(a, ln2), pm))

                def loss(a, l2, pm):
                    return jnp.sum(half(a, l2, pm).astype(jnp.float32) ** 2)

                da, dl, dm = jax.grad(loss, argnums=(0, 1, 2))(
                    hc, lp["ln2"], lp["mlp"])
                return da + (force((dl, dm)) * 1e-20).astype(hc.dtype), None
        else:
            bb = int(arg)

            def body(hc, lp, _bb=bb):
                dx, dl, dm = _pallas_mlp_bwd_flat(
                    hc, hc, lp["ln2"], lp["mlp"], 1e-5, block_b=_bb)
                return dx + (force((dl, dm)) * 1e-20).astype(hc.dtype), None

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
            print(f"{arg:>8}: compile+warm {time.perf_counter()-t0:.0f}s",
                  flush=True)
            t0 = time.perf_counter()
            float(chain(params, x, jnp.int32(10)))
            dt = (time.perf_counter() - t0) / 10
            print(f"{arg:>8}: {dt*1e3:6.1f} ms for the 12-layer stack",
                  flush=True)
        except Exception as e:
            print(f"{arg:>8}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


def fwd_mode():
    """fwd-N = Pallas fwd kernel at block_b=N; fwd-xla = flat composed."""
    from plip_tpu.ops.mlp import _jnp_mlp_sublayer_flat, _pallas_mlp_fwd_flat

    params = init_block_stack(jax.random.PRNGKey(0), L, W)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, W)).astype(np.float32),
                    jnp.bfloat16)
    for arg in sys.argv[2:]:
        if arg == "xla":
            def body(hc, lp):
                return _jnp_mlp_sublayer_flat(hc, lp["ln2"], lp["mlp"],
                                              1e-5), None
        else:
            bb = int(arg)

            def body(hc, lp, _bb=bb):
                from plip_tpu.ops.mlp import _pallas_mlp_fwd_flat as f
                return f(hc, lp["ln2"], lp["mlp"], 1e-5, block_b=_bb), None

        @jax.jit
        def chain(p, h, n, _body=body):
            def it(_, hc):
                out, _n = jax.lax.scan(_body, hc, p)
                return hc + (jnp.sum(out.astype(jnp.float32)) * 1e-20
                             ).astype(hc.dtype)

            h2 = jax.lax.fori_loop(0, n, it, h)
            return jnp.sum(h2[0, 0].astype(jnp.float32))

        try:
            float(chain(params, x, jnp.int32(2)))
            t0 = time.perf_counter()
            float(chain(params, x, jnp.int32(10)))
            dt = (time.perf_counter() - t0) / 10
            print(f"fwd-{arg:>4}: {dt*1e3:6.1f} ms for the 12-layer stack",
                  flush=True)
        except Exception as e:
            print(f"fwd-{arg:>4}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "fwd":
        fwd_mode()
    else:
        main()
