"""L/14 ENCODE b64: composed dispatch (the W>768 fwd-only gate) vs forced
flat fwd — revisited in r4 because the flat fwd core is now pipelined and
the composed path's LN fusions measured ~2.4x BW floor (4.8 ms/batch at b64).
One process."""

import time

from _harness import setup, chain

setup()

import numpy as np
import jax
import jax.numpy as jnp

from plip_tpu.models import clip as jclip, layers
from plip_tpu.models.config import CLIPConfig

ITERS = 12


def main():
    cfg = CLIPConfig.vit_l14()
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal((64, 224, 224, 3)).astype(np.float32))

    runners = {}
    for name, gate in (("composed", 768), ("flat", 2048)):
        layers._FLAT_FWD_ONLY_MAX_W = gate
        fn = (lambda _cfg: lambda p, x: jclip.encode_image(
            p, x, _cfg, jnp.bfloat16))(cfg)
        r = chain(fn, ITERS,
                  perturb=lambda args, c: (
                      args[0], args[1] + (c * 1e-20).astype(args[1].dtype)))
        t0 = time.perf_counter()
        r(params, px)
        print(f"compiled {name} in {time.perf_counter()-t0:.0f}s", flush=True)
        runners[name] = r
    layers._FLAT_FWD_ONLY_MAX_W = 768

    times = {n: [] for n in runners}
    for _ in range(3):
        for n, r in runners.items():
            t0 = time.perf_counter()
            r(params, px)
            times[n].append((time.perf_counter() - t0) / ITERS)
    for n, ts in times.items():
        best = min(ts)
        print(f"{n:9s}: {best*1e3:7.2f} ms/batch  {64/best:7,.0f} img/s  "
              f"(all: {', '.join(f'{t*1e3:.2f}' for t in ts)})", flush=True)


if __name__ == "__main__":
    main()
