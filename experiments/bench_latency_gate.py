"""p50 zero-shot latency (VERDICT r2 #6): the flat block-diag kernels
regressed B=1 from 25.4 -> 29.7 ms. Compare dispatch options for the
single-image path to pick a small-batch gate:

  flat     — status quo (flat tower, whole-array block at B=1)
  composed — _use_pallas() off (straight XLA both towers)
  img3d    — flat gate off for the B=1 image tower only (text stays flat)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from plip_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache("/root/repo/.jax_cache")

import time

import numpy as np

import jax
import jax.numpy as jnp

from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig
from plip_tpu.ops.preprocess import preprocess_batch
from plip_tpu.tokenizer import default_tokenizer


def measure(tag):
    cfg = CLIPConfig.vit_b32()
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    tok = default_tokenizer()
    ids = jnp.asarray(tok.tokenize([f"an H&E image of class {i}" for i in range(4)]))
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 256, (1, 256, 256, 3), dtype=np.uint8))

    @jax.jit
    def zero_shot(params, raw, ids):
        px = preprocess_batch(raw)
        img = jclip.l2_normalize(jclip.encode_image(params, px, cfg, jnp.bfloat16))
        txt = jclip.l2_normalize(jclip.encode_text(params, ids, cfg, jnp.bfloat16))
        return jnp.argmax(img @ txt.T, -1)[0]

    int(zero_shot(params, raw, ids))
    lats = []
    for _ in range(50):
        t0 = time.perf_counter()
        int(zero_shot(params, raw, ids))
        lats.append(time.perf_counter() - t0)
    lats.sort()
    print(f"{tag}: p50={lats[25]*1e3:.1f} ms  p10={lats[5]*1e3:.1f}  "
          f"p90={lats[45]*1e3:.1f}", flush=True)


def main():
    import plip_tpu.ops.attention as A

    measure("flat (status quo)")

    orig = A._use_pallas
    A._use_pallas = lambda: False
    measure("composed")
    A._use_pallas = orig

    # flat gate off for tiny token counts only (the candidate small-batch
    # dispatch): B=1 image tower (N=50) goes composed-3D, text stays flat
    orig_ok = A._flat_pallas_ok
    A._flat_pallas_ok = lambda N, S, p: N > 128 and orig_ok(N, S, p)
    measure("small-N composed")
    A._flat_pallas_ok = orig_ok


if __name__ == "__main__":
    main()
