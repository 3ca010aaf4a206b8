"""Isolate the optimizer cost inside the train step (round-2 follow-up).

bench_train_decomp measured full step 279.5 ms vs forced-grads 245.6 ms at
b512 -> ~34 ms for AdamW+clamp. The HBM floor for AdamW on 151M fp32 params
is ~4.2 GB of traffic ≈ 5-6 ms on v5e, so ~28 ms is overhead. This times:

  1. grads-only (forced via deep-leaf fetch)
  2. grads + adamw.update (no apply)
  3. grads + update + apply_updates (no clamp)
  4. the full train step (donated state)

to find where the gap lives (update math, apply pass, donation failure,
or the loss-metrics aux)."""

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
from plip_tpu.train.contrastive import (clamp_logit_scale, clip_loss,
                                        init_train_state, make_optimizer,
                                        make_train_step)


def chain_timeit(scalar_fn, *args, iters=10):
    @jax.jit
    def chain(px, n, *rest):
        def body(_, px_c):
            s = scalar_fn(px_c, *rest)
            return px_c + (s * 1e-20).astype(px_c.dtype)

        px2 = jax.lax.fori_loop(0, n, body, px)
        return jnp.sum(px2[0, 0, 0])

    float(chain(args[0], 2, *args[1:]))
    t0 = time.perf_counter()
    float(chain(args[0], iters, *args[1:]))
    return (time.perf_counter() - t0) / iters


def force(g):
    return (jnp.sum(g["visual"]["patch_embed"]["kernel"])
            + jnp.sum(g["text"]["token_embed"]))


def main():
    cfg = CLIPConfig.vit_b32()
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(total_steps=100)
    state = init_train_state(params, opt)
    rng = np.random.default_rng(0)
    batch = 512
    px = jnp.asarray(rng.standard_normal((batch, 224, 224, 3)).astype(np.float32))
    ids_np = np.zeros((batch, 77), np.int32)
    ids_np[:, 0] = 49406
    ids_np[:, 1] = np.arange(batch) % 49000
    ids_np[:, 2] = 49407
    ids = jnp.asarray(ids_np)

    def loss_fn(p, px_c):
        return clip_loss(p, px_c, ids, cfg, jnp.bfloat16, "mlp")[0]

    def g_only(px_c, params):
        return force(jax.grad(loss_fn)(params, px_c))

    dt = chain_timeit(g_only, px, params)
    print(f"grads only:           {dt*1e3:7.1f} ms {batch/dt:7,.0f} pairs/s")

    def g_update(px_c, params, opt_state):
        g = jax.grad(loss_fn)(params, px_c)
        updates, _ = opt.update(g, opt_state, params)
        return force(updates)

    dt = chain_timeit(g_update, px, params, state.opt_state)
    print(f"grads+update:         {dt*1e3:7.1f} ms {batch/dt:7,.0f} pairs/s")

    def g_apply(px_c, params, opt_state):
        g = jax.grad(loss_fn)(params, px_c)
        updates, _ = opt.update(g, opt_state, params)
        p2 = optax.apply_updates(params, updates)
        return jnp.sum(p2["logit_scale"]) + force(updates) * 0

    dt = chain_timeit(g_apply, px, params, state.opt_state)
    print(f"grads+update+apply:   {dt*1e3:7.1f} ms {batch/dt:7,.0f} pairs/s")

    # full step, state donated across the fori_loop
    step = make_train_step(cfg, opt, dtype=jnp.bfloat16, remat="mlp")

    @jax.jit
    def steps(state, px, ids, n):
        def body(_, s):
            s2, _ = step(s, px, ids)
            return s2

        return jax.lax.fori_loop(0, n, body, state)

    s2 = steps(state, px, ids, 2)
    float(s2.params["logit_scale"])
    t0 = time.perf_counter()
    s3 = steps(s2, px, ids, 10)
    float(s3.params["logit_scale"])
    dt = (time.perf_counter() - t0) / 10
    print(f"full step:            {dt*1e3:7.1f} ms {batch/dt:7,.0f} pairs/s")


if __name__ == "__main__":
    main()
