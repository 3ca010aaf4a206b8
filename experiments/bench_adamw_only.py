"""AdamW-only microbench: full update+apply with REAL state writes.

bench_optimizer's grads+update+apply probe under-measured (fetching one
scalar lets XLA DCE every other leaf's m/v/param writes). Here the whole
(params, opt_state) is the fori_loop carry, so every leaf is written each
iteration — the true optimizer wall. Floor: ~4.2 GB traffic / 819 GB/s
≈ 5.2 ms for 151M fp32 params on v5e."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig
from plip_tpu.train.contrastive import init_train_state, make_optimizer


def main():
    cfg = CLIPConfig.vit_b32()
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    n_params = sum(int(x.size) for x in jax.tree.leaves(params))
    print(f"params: {n_params/1e6:.1f}M "
          f"(floor ~{n_params*4*7/819e9*1e3:.1f} ms at 819 GB/s)")
    opt = make_optimizer(total_steps=1000)
    state = init_train_state(params, opt)
    grads = jax.tree.map(lambda x: jnp.full_like(x, 1e-6), params)

    @jax.jit
    def opt_steps(params, opt_state, grads, n):
        def body(_, carry):
            p, s = carry
            u, s2 = opt.update(grads, s, p)
            return (optax.apply_updates(p, u), s2)

        return jax.lax.fori_loop(0, n, body, (params, opt_state))

    p2, s2 = opt_steps(params, state.opt_state, grads, 2)
    float(p2["logit_scale"])
    t0 = time.perf_counter()
    p3, s3 = opt_steps(p2, s2, grads, 20)
    float(p3["logit_scale"])
    dt = (time.perf_counter() - t0) / 20
    print(f"adamw update+apply: {dt*1e3:.2f} ms/step")

    # sgd as the traffic control (reads g+p, writes p: 1.8 GB -> ~2.2 ms)
    sgd = optax.sgd(1e-6)
    sstate = sgd.init(params)

    @jax.jit
    def sgd_steps(params, opt_state, grads, n):
        def body(_, carry):
            p, s = carry
            u, s2 = sgd.update(grads, s, p)
            return (optax.apply_updates(p, u), s2)

        return jax.lax.fori_loop(0, n, body, (params, opt_state))

    p2, s2 = sgd_steps(params, sstate, grads, 2)
    float(p2["logit_scale"])
    t0 = time.perf_counter()
    p3, s3 = sgd_steps(p2, s2, grads, 20)
    float(p3["logit_scale"])
    dt = (time.perf_counter() - t0) / 20
    print(f"sgd   update+apply: {dt*1e3:.2f} ms/step")


if __name__ == "__main__":
    main()
