"""In-process block_b sweep for the padded flat path at S > 128 (row-blocked
core). Compares bb in {1, 2, 4} plus the composed dispatch for one arch, all
compiled up front, timed interleaved (cross-process tunnel variance ~8%).

Usage: python -u experiments/bench_bb_sweep.py [--arch b16|l14] [--batch N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from plip_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache("/root/repo/.jax_cache")

import numpy as np

import jax
import jax.numpy as jnp

import plip_tpu.models.layers as L
import plip_tpu.ops.attention as A
from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig

L._FLAT_FWD_ONLY_MAX_W = 1 << 20  # bypass the fwd-only width gate: this
# sweep measures the flat variants the production dispatch rejects

_orig_ok = A._flat_pallas_ok
_orig_want = A._flat_want


def main():
    arch = "b16"
    batch = 256
    if "--arch" in sys.argv:
        arch = sys.argv[sys.argv.index("--arch") + 1]
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    cfg = {"b16": CLIPConfig.vit_b16, "l14": CLIPConfig.vit_l14}[arch]()
    params = jclip.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    px = jnp.asarray(
        rng.standard_normal((batch, 224, 224, 3)).astype(np.float32))

    def build():
        @jax.jit
        def chain(params, px, n):
            def body(_, p):
                out = jclip.encode_image(params, p, cfg, dtype=jnp.bfloat16)
                return p + (jnp.sum(out) * 1e-20).astype(p.dtype)
            return jnp.sum(jax.lax.fori_loop(0, n, body, px)[0, 0, 0])
        return chain

    def gate_for(bb):
        if bb is None:  # composed
            return lambda N, S, p: S <= 128 and _orig_ok(N, S, p)
        return _orig_ok

    variants = {}
    for bb in (1, 2, 4, None):
        tag = f"flat bb={bb}" if bb else "composed"
        chain = build()
        A._flat_pallas_ok = gate_for(bb)
        if bb:
            A._flat_want = lambda S, _bb=bb: _bb if S > 128 else 4
        t0 = time.perf_counter()
        float(chain(params, px, 1))
        A._flat_pallas_ok = _orig_ok
        A._flat_want = _orig_want
        print(f"  compiled {tag} in {time.perf_counter()-t0:.0f}s", flush=True)
        variants[tag] = chain

    times = {t: [] for t in variants}
    for _ in range(3):
        for tag, chain in variants.items():
            float(chain(params, px, 2))
            t0 = time.perf_counter()
            float(chain(params, px, 10))
            times[tag].append((time.perf_counter() - t0) / 10)
    for tag, ts in times.items():
        best = min(ts)
        print(f"{arch} b{batch} {tag:12s}: best {best*1e3:7.1f} ms  "
              f"{batch/best:6,.0f} img/s  "
              f"(all: {', '.join(f'{t*1e3:.1f}' for t in ts)})", flush=True)


if __name__ == "__main__":
    main()
