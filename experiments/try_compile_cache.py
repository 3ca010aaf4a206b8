"""Persistent compilation cache probe (VERDICT r2 #3).

The flat block-diag bwd Mosaic compile is ~10 min/shape, every process. If
``jax_compilation_cache_dir`` works on the axon (remote-compile tunnel)
backend, a second process should hit the cache and compile in seconds.

Run twice: first process populates, second should be fast. Prints the
compile+first-execute wall time of a kernel-bearing jit.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig


def main():
    cfg = CLIPConfig.vit_b32()
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    B = 32  # small batch: keep the probe cheap but kernel-bearing

    @jax.jit
    def enc(params, px):
        return jclip.encode_image(params, px, cfg, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal((B, 224, 224, 3)).astype(np.float32))
    t0 = time.perf_counter()
    out = enc(params, px)
    s = float(jnp.sum(out))
    dt = time.perf_counter() - t0
    print(f"compile+first-exec: {dt:.1f}s (sum={s:.3f})")
    print("cache dir contents:", len(os.listdir("/root/repo/.jax_cache"))
          if os.path.isdir("/root/repo/.jax_cache") else "absent")


if __name__ == "__main__":
    main()
