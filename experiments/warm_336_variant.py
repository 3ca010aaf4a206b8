"""Compile-warm ONE bench_336_core variant (separate process per compile:
the axon remote-compile tunnel can silently drop a large upload and
deadlock the client — per-variant processes + the persistent cache make
each compile retryable without losing the others)."""
import sys
import numpy as np
from _harness import setup, sync, chain
setup()
import jax, jax.numpy as jnp
from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig
from plip_tpu.ops import attention as A

VARIANTS = {
    "base_h2_serial": dict(pipe=False, hpp=2, bq=256),
    "pipe_h2": dict(pipe=True, hpp=2, bq=256),
    "pipe_h4": dict(pipe=True, hpp=4, bq=256),
    "pipe_h8": dict(pipe=True, hpp=8, bq=256),
    "pipe_h16": dict(pipe=True, hpp=16, bq=256),
    "pipe_h16_bq592": dict(pipe=True, hpp=16, bq=592),
}
name = sys.argv[1]
kw = VARIANTS[name]
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5
cfg = CLIPConfig.vit_l14_336()
params = jclip.init_params(jax.random.PRNGKey(1), cfg)
rng = np.random.default_rng(1)
px = jnp.asarray(rng.standard_normal(
    (batch, cfg.vision.image_size, cfg.vision.image_size, 3)
).astype(np.float32))
A._FLASH_PIPE_OVERRIDE = kw["pipe"]
A._FLASH_HPP_OVERRIDE = kw["hpp"]
A._FLASH_BQ_OVERRIDE = kw["bq"]
run = chain(lambda x: jclip.encode_image(params, x, cfg, jnp.bfloat16), iters)
import time
t0 = time.perf_counter()
run(px)
print(f"{name}: compiled+ran in {time.perf_counter()-t0:.0f}s", flush=True)
