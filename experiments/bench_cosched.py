"""Co-scheduled dW streams in the whole-block backward kernel (VERDICT r4
ask #6 — the one untried idea named by PERF.md's train-MFU closure).

Hypothesis: the whole-block bwd kernel (ops/block_bwd.py) loses in-model
(r3: 244-260 ms vs 234.3 remat="mlp" at B/32 b512) because back-to-back
Pallas programs serialize where XLA used to overlap — but the kernel owns
BOTH halves, so the MLP's three big dW dots (dw2/dw1/dwout, all off the dx
critical path) can be deferred and interleaved into the attention head
loop's VPU islands, giving the VLIW scheduler a dense MXU stream to overlap
every island with (the r4 pipelining discovery, applied ACROSS sublayers).
The fwd-recompute and bwd head chains are additionally pipelined à la
`_core_fwd_bwd_block`.

Variants (full B/32 train step b512, ONE process, interleaved):
  mlp            shipped remat="mlp" composition (attn kernel + XLA MLP)
  block_serial   whole-block bwd kernel, r3 serial schedule
  block_cosched  whole-block bwd kernel, co-scheduled + pipelined

Ship rule (VERDICT): wire if block_cosched >= +3% vs mlp; otherwise archive
the closure with these numbers.

Usage: python -u experiments/bench_cosched.py [--batch 512] [--iters 5]
"""

import sys
import time

import numpy as np

from _harness import setup, chain_train

setup()

import jax
import jax.numpy as jnp

import plip_tpu.ops.block_bwd as BB
from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig
from plip_tpu.train.contrastive import (init_train_state, make_optimizer,
                                        make_train_step)

GFL_PAIR = 14.86
PEAK = 197e12


def main():
    batch = (int(sys.argv[sys.argv.index("--batch") + 1])
             if "--batch" in sys.argv else 512)
    iters = (int(sys.argv[sys.argv.index("--iters") + 1])
             if "--iters" in sys.argv else 5)
    cfg = CLIPConfig.vit_b32()
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(total_steps=100)
    rng = np.random.default_rng(0)
    px = jnp.asarray(
        rng.standard_normal((batch, 224, 224, 3)).astype(np.float32))
    ids_np = np.zeros((batch, 77), np.int32)
    ids_np[:, 0] = 49406
    ids_np[:, 1] = np.arange(batch) % 49000
    ids_np[:, 2] = 49407
    ids = jnp.asarray(ids_np)

    variants = {
        "mlp": ("mlp", False),
        "block_serial": ("block", False),
        "block_cosched": ("block", True),
    }
    runs, states = {}, {}
    for name, (remat, cosched) in variants.items():
        BB._COSCHED = cosched  # trace-time: compile INSIDE the scope
        try:
            step = make_train_step(cfg, opt, dtype=jnp.bfloat16, remat=remat)
            run = chain_train(step, iters)
            # fresh leaf copies: the donated state aliases whatever params
            # tree it was built from, and the first run() deletes it
            params_v = jax.tree.map(lambda a: jnp.array(a, copy=True), params)
            states[name] = init_train_state(params_v, opt)
            t0 = time.perf_counter()
            states[name] = run(states[name], px, ids)
            float(states[name].params["logit_scale"])
            print(f"compiled {name} in {time.perf_counter()-t0:.0f}s",
                  flush=True)
            runs[name] = run
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
        finally:
            BB._COSCHED = False

    times = {n: [] for n in runs}
    for _ in range(3):
        for name, run in runs.items():
            t0 = time.perf_counter()
            states[name] = run(states[name], px, ids)
            float(states[name].params["logit_scale"])
            times[name].append((time.perf_counter() - t0) / iters)
    for name in runs:
        t = min(times[name])
        print(f"{name:14s} {t*1e3:7.1f} ms/step  {batch/t:7,.0f} pairs/s  "
              f"(MFU {batch*3*GFL_PAIR*1e9/t/PEAK*100:.0f}%@3x; "
              f"all: {', '.join(f'{x*1e3:.1f}' for x in times[name])})",
              flush=True)


if __name__ == "__main__":
    main()
