"""Text tower S=77 vs 80 lane-padding study (VERDICT r1 #8, CLAUDE.md roadmap).

S=77 is not a multiple of the 8-sublane tile; padding the *context length* to
80 (pos_embed rows + id padding after EOT) makes every [S, W] activation
tile-aligned at the cost of 3.9% more FLOPs. EOT pooling is position-based,
and the causal mask means trailing pad tokens cannot influence earlier
positions, so ctx-80 embeddings of 77-token inputs equal the ctx-77 ones
when weights are shared (checked here before timing).

The chain threads each iteration's output back through token_embed (the
tower INPUT) — perturbing only the final proj lets XLA hoist the whole
tower out of the loop (bench_fused_block.py's text section had that bug;
its 246k texts/s is invalid — the true baseline is re-measured here)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp

from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig


def timeit_text(params, ids, cfg, iters=20):
    @jax.jit
    def chain(params, ids, n):
        def body(_, tok):
            p2 = {**params, "text": {**params["text"], "token_embed": tok}}
            out = jclip.encode_text(p2, ids, cfg, dtype=jnp.bfloat16)
            return tok + (jnp.sum(out) * 1e-20).astype(tok.dtype)

        t2 = jax.lax.fori_loop(0, n, body, params["text"]["token_embed"])
        return jnp.sum(t2[0])

    float(chain(params, ids, 2))
    t0 = time.perf_counter()
    float(chain(params, ids, iters))
    return (time.perf_counter() - t0) / iters


def main():
    batch = 1024
    cfg77 = CLIPConfig.vit_b32()
    params = jclip.init_params(jax.random.PRNGKey(0), cfg77)
    ids_np = np.zeros((batch, 77), np.int32)
    ids_np[:, 0] = 49406
    ids_np[:, 1] = np.arange(batch) % 49000
    ids_np[:, 2] = 49407

    # ctx-80 variant: same weights, pos_embed zero-padded to 80 rows, ids
    # zero-padded (EOT position unchanged).
    cfg80 = dataclasses.replace(
        cfg77, text=dataclasses.replace(cfg77.text, context_length=80))
    pos = params["text"]["pos_embed"]
    params80 = {
        **params,
        "text": {**params["text"],
                 "pos_embed": jnp.concatenate(
                     [pos, jnp.zeros((3, pos.shape[1]), pos.dtype)])},
    }
    ids80_np = np.zeros((batch, 80), np.int32)
    ids80_np[:, :77] = ids_np

    ids77 = jnp.asarray(ids_np)
    ids80 = jnp.asarray(ids80_np)

    emb77 = np.asarray(jclip.encode_text(params, ids77, cfg77, jnp.bfloat16))
    emb80 = np.asarray(jclip.encode_text(params80, ids80, cfg80, jnp.bfloat16))
    cos = np.sum(emb77 * emb80, -1) / (
        np.linalg.norm(emb77, axis=-1) * np.linalg.norm(emb80, axis=-1))
    print(f"ctx-80 vs ctx-77 embedding cosine: min {cos.min():.6f}")

    dt = timeit_text(params, ids77, cfg77)
    print(f"ctx=77: {batch/dt:8,.0f} texts/s ({dt*1e3:.1f} ms/batch-{batch})")
    dt = timeit_text(params80, ids80, cfg80)
    print(f"ctx=80: {batch/dt:8,.0f} texts/s ({dt*1e3:.1f} ms/batch-{batch})")


if __name__ == "__main__":
    main()
