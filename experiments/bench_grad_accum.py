"""Gradient-exact InfoNCE accumulation (train/contrastive._accum_infonce_grads)
measured on TPU.

Questions:
1. cost of the accumulated step vs single-pass at the same batch
   (B/32 b512, accum 1 vs 2) — expected ~1.5x FLOPs (one extra forward);
2. the memory lever: largest L/14 batch. Single-pass b192 OOMs on v5e-16GB
   (b>=128 already loses to b96; b192 does not fit at all) — does
   accum_steps=2 (microbatch 96 = the per-pass optimum) run it, and at what
   pairs/s vs the b96 single-pass baseline?
3. bf16 loss parity single vs accum from the same init.

One process, interleaved rounds (CLAUDE.md measurement discipline).
"""

import sys

from _harness import setup, interleave, sync, chain_train, make_clip_batch

setup()

import jax
import jax.errors
import jax.numpy as jnp

from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig
from plip_tpu.train.contrastive import (
    init_train_state,
    make_optimizer,
    make_train_step,
)


def train_runner(cfg, params, batch, accum, n_iter=4, remat="mlp"):
    opt = make_optimizer(1e-5, warmup=10, total_steps=1000)
    step = make_train_step(cfg, opt, dtype=jnp.bfloat16, remat=remat,
                           accum_steps=accum)
    px, ids = make_clip_batch(batch, ctx=cfg.text.context_length)
    run = chain_train(step, n_iter)

    def go():
        state = init_train_state(jax.tree.map(jnp.copy, params), opt)
        s2 = run(state, px, ids)
        sync(s2.params["logit_scale"])

    return go, n_iter


def loss_parity(cfg, params, batch):
    opt = make_optimizer(1e-5, warmup=10, total_steps=1000)
    px, ids = make_clip_batch(batch, ctx=cfg.text.context_length)
    out = {}
    for k in (1, 2, 4):
        step = make_train_step(cfg, opt, dtype=jnp.bfloat16, remat="mlp",
                               accum_steps=k)
        state = init_train_state(jax.tree.map(jnp.copy, params), opt)
        _, m = step(state, px, ids)
        out[k] = float(m["loss"])
    return out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("b32", "all"):
        cfg = CLIPConfig.vit_b32()
        params = jclip.init_params(jax.random.PRNGKey(0), cfg)
        par = loss_parity(cfg, params, 256)
        print(f"B/32 b256 bf16 first-step loss accum 1/2/4: {par}", flush=True)
        B = 512
        r1, n1 = train_runner(cfg, params, B, 1)
        r2, n2 = train_runner(cfg, params, B, 2)
        best, _ = interleave({"accum1": r1, "accum2": r2}, rounds=3)
        for name, t in best.items():
            n = n1
            print(f"B/32 b{B} {name}: {t / n * 1e3:.1f} ms/step "
                  f"({B * n / t:.0f} pairs/s)", flush=True)

    if which in ("l14", "all"):
        cfg = CLIPConfig.vit_l14()
        params = jclip.init_params(jax.random.PRNGKey(0), cfg)
        runners = {}
        meta = {}
        for batch, accum in ((96, 1), (192, 2), (384, 4)):
            go, n = train_runner(cfg, params, batch, accum, n_iter=3)
            name = f"b{batch}_accum{accum}"
            runners[name] = go
            meta[name] = (batch, n)
        # compile/warm one at a time so an OOM names its config — and only
        # interleave the survivors (one OOM must not kill the comparison)
        alive = {}
        for name, go in runners.items():
            try:
                go()
                alive[name] = go
            # axon surfaces device OOM as ValueError or JaxRuntimeError
            # depending on where the fetch happens
            except (ValueError, jax.errors.JaxRuntimeError) as e:
                print(f"L/14 {name}: OOM ({str(e).splitlines()[0][:80]})",
                      flush=True)
        best, _ = interleave(alive, rounds=3, warmup=0)
        for name, t in best.items():
            batch, n = meta[name]
            print(f"L/14 {name}: {t / n * 1e3:.1f} ms/step "
                  f"({batch * n / t:.0f} pairs/s)", flush=True)
        if not best:
            print("L/14: all configs OOM'd", flush=True)


if __name__ == "__main__":
    main()
