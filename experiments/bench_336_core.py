"""L/14@336 (S=577) attention-core tuning A/B (VERDICT r4 #3).

The r4 profile at @336 b32: encode 108.8 ms/batch — dense fusions at ~100%
of peak (57 ms ≈ the 24-layer matmul floor) but the attention custom-call at
40.2 ms ≈ 13% of the MXU core floor. The S>512 flash kernel predates the r4
pipelining discovery (per-head dot→softmax→dot chains execute at the SUM of
MXU and VPU time unless head j+1's QK dot is issued before head j's
softmax/PV, with the softmax divide deferred into the [BQ, D] context).

Variants (full L/14@336 encode tower, ONE process, interleaved):
  base       flash bq=256 hpp=2, serial normalize-first (r4 shipped)
  pipe_h2    pipelined + deferred divide, same geometry
  pipe_h4/8/16  longer in-program head chains (hpp heads per program)
  pipe_h16_bq592 single q block (whole 16-padded row) + single head group
  perrow     per-row _mha_kernel at S=577 (gate raised; r4 pipelined S>128
             schedule) — tests whether the S<=512 winner extends

Usage: python experiments/bench_336_core.py [--batch 32] [--iters 5]
"""

import sys

from _harness import setup, sync, chain, interleave

setup()

import numpy as np
import jax
import jax.numpy as jnp

from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig
from plip_tpu.ops import attention as A


def main():
    batch = (int(sys.argv[sys.argv.index("--batch") + 1])
             if "--batch" in sys.argv else 32)
    iters = (int(sys.argv[sys.argv.index("--iters") + 1])
             if "--iters" in sys.argv else 5)
    cfg = CLIPConfig.vit_l14_336()
    params = jclip.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    px = jnp.asarray(rng.standard_normal(
        (batch, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32))

    def make_runner(pipe, hpp, bq, perrow=False):
        """Build + compile the chained encode INSIDE the override scope
        (overrides are read at trace time — CLAUDE.md r4 trap)."""
        A._FLASH_PIPE_OVERRIDE = pipe
        A._FLASH_HPP_OVERRIDE = hpp
        A._FLASH_BQ_OVERRIDE = bq
        A._PERROW_MAX_S = 640 if perrow else 512
        try:
            run = chain(
                lambda x: jclip.encode_image(params, x, cfg, jnp.bfloat16),
                iters)
            run(px)  # compile + warm now, inside the scope
        finally:
            A._FLASH_PIPE_OVERRIDE = None
            A._FLASH_HPP_OVERRIDE = None
            A._FLASH_BQ_OVERRIDE = None
            A._PERROW_MAX_S = 512
        return lambda: run(px)

    variants = {
        "base_h2_serial": dict(pipe=False, hpp=2, bq=256),
        "pipe_h2": dict(pipe=True, hpp=2, bq=256),
        "pipe_h4": dict(pipe=True, hpp=4, bq=256),
        "pipe_h8": dict(pipe=True, hpp=8, bq=256),
        "pipe_h16": dict(pipe=True, hpp=16, bq=256),
        "pipe_h16_bq592": dict(pipe=True, hpp=16, bq=592),
        "perrow": dict(pipe=None, hpp=None, bq=None, perrow=True),
    }
    # parity check vs the jnp reference before timing anything
    qkv = jnp.asarray(rng.standard_normal((2, 577, 3 * 1024))
                      .astype(np.float32)).astype(jnp.bfloat16)
    ref = A._jnp_mha(qkv, 16, False)
    for name, kw in list(variants.items()):
        try:
            if kw.get("perrow"):
                got = A._pallas_mha(qkv, 16, False)
            else:
                got = A._pallas_flash_mha(qkv, 16, False, block_q=kw["bq"],
                                          hpp=kw["hpp"], pipeline=kw["pipe"])
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
        except Exception as e:
            print(f"parity {name}: FAILED to compile: {str(e)[:200]}",
                  flush=True)
            del variants[name]
            continue
        print(f"parity {name}: max|d|={err:.5f}", flush=True)
        assert err < 0.02, name

    runners = {}
    for name, kw in variants.items():
        print(f"compiling {name} ...", flush=True)
        try:
            runners[name] = make_runner(**kw)
        except Exception as e:  # e.g. VMEM exhaustion at whole-row S=577
            print(f"  {name} FAILED to compile: {str(e)[:200]}", flush=True)
    best, _ = interleave(runners, rounds=3)
    for name, t in sorted(best.items(), key=lambda kv: kv[1]):
        ms = t / iters * 1000
        print(f"{name:18s} {ms:8.2f} ms/batch  {batch / ms * 1000:7.0f} img/s")


if __name__ == "__main__":
    main()
