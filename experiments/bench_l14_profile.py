"""Profile the ViT-L/14 b64 train step on the axon TPU and print the
per-while (scan) decomposition + top ops — the same method that overturned
the B/32 backward attribution (CLAUDE.md round-3 findings). Then a one-process
A/B of backward modes / batch sizes can be aimed at the real hot spot."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from plip_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache("/root/repo/.jax_cache")

import numpy as np

import jax
import jax.numpy as jnp

from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig
from plip_tpu.train.contrastive import (init_train_state, make_optimizer,
                                        make_train_step)


def main():
    batch = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 64
    outdir = f"/tmp/jaxtrace_l14_b{batch}"
    cfg = CLIPConfig.vit_l14()
    params = jclip.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    opt = make_optimizer(total_steps=100)
    state = init_train_state(params, opt)
    step = make_train_step(cfg, opt, dtype=jnp.bfloat16, remat="mlp")
    px = jnp.asarray(rng.standard_normal((batch, 224, 224, 3)).astype(np.float32))
    ids_np = np.zeros((batch, 77), np.int32)
    ids_np[:, 0] = 49406
    ids_np[:, 1] = np.arange(batch) % 49000
    ids_np[:, 2] = 49407
    ids = jnp.asarray(ids_np)
    state, _ = step(state, px, ids)
    float(state.params["logit_scale"])
    print("warm done", flush=True)
    with jax.profiler.trace(outdir):
        for _ in range(3):
            state, _ = step(state, px, ids)
        float(state.params["logit_scale"])
    print("trace done", flush=True)

    from plip_tpu.utils.profiling import parse_device_trace

    dec = parse_device_trace(outdir, n_steps=3, step_prefix="jit_step")
    print(f"step total: {dec['step_total_ms']:.1f} ms")
    for wn in sorted(dec["groups"]):
        g = dec["groups"][wn]
        print(f"\n=== {wn}: {g['total_ms']:.2f} ms/step ===")
        for n, d in g["ops"][:8]:
            print(f"  {d:7.3f} ms/step  {n[:90]}")
    print(f"\noutside-scan {dec['outside_ms']:.1f} ms")


if __name__ == "__main__":
    main()
