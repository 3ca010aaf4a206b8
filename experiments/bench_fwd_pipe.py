"""A/B the pipelined + deferred-divide FORWARD core schedule
(_PIPE_FWD_OVERRIDE) in full encode, one process:

- ViT-B/32 b256 encode (flat kernels, S=50 bb=4 + text unused): force ON vs
  the default bit-exact schedule.
- ViT-B/16 b256 encode (flat, S=200 row-blocked): ON is the S>128 default —
  measure ON vs OFF.
"""

import sys
import time

from _harness import setup, chain

setup()

import numpy as np
import jax
import jax.numpy as jnp

from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig
from plip_tpu.ops import attention


def bench(arch, batch, pipe_values, iters=20):
    cfg = getattr(CLIPConfig, arch)()
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal(
        (batch, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32))

    runners = {}
    for pv in pipe_values:
        attention._PIPE_FWD_OVERRIDE = pv
        fn = (lambda _cfg: lambda p, x: jclip.encode_image(
            p, x, _cfg, jnp.bfloat16))(cfg)
        r = chain(fn, iters,
                  perturb=lambda args, c: (
                      args[0], args[1] + (c * 1e-20).astype(args[1].dtype)))
        t0 = time.perf_counter()
        r(params, px)
        print(f"  compiled pipe={pv} in {time.perf_counter()-t0:.0f}s",
              flush=True)
        runners[str(pv)] = r
    attention._PIPE_FWD_OVERRIDE = None

    times = {n: [] for n in runners}
    for _ in range(3):
        for n, r in runners.items():
            t0 = time.perf_counter()
            r(params, px)
            times[n].append((time.perf_counter() - t0) / iters)
    for n, ts in times.items():
        best = min(ts)
        print(f"  pipe={n:5s}: {best*1e3:7.2f} ms/batch  "
              f"{batch/best:8,.0f} img/s  "
              f"(all: {', '.join(f'{t*1e3:.2f}' for t in ts)})", flush=True)


def main():
    model = (sys.argv[sys.argv.index("--model") + 1]
             if "--model" in sys.argv else "b32")
    if model == "b32":
        print("== ViT-B/32 b256 encode (flat, S=50; pipeline default OFF) ==")
        bench("vit_b32", 256, [None, True])
    else:
        print("== ViT-B/16 b256 encode (flat, S=200; pipeline default ON) ==")
        bench("vit_b16", 256, [None, False])


if __name__ == "__main__":
    main()
