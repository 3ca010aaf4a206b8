"""ViT-L/14 in-process A/B: the round-3 padded flat path (S=257 -> 264,
row-blocked core, block_b=4 fused sublayer fwd+bwd) vs the round-2 dispatch
(3D scan, composed
sublayer with the Pallas attention core). Cross-process tunnel variance ~8%
makes separate runs unreadable; here both variants are compiled up front and
the timed runs interleave.

Control knob: _flat_pallas_ok is monkeypatched to reject S > 128, which
restores the exact round-2 dispatch (the 3D scan path still uses
fused_attention / attention_sublayer's own gates)."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from plip_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache("/root/repo/.jax_cache")

import numpy as np

import jax
import jax.numpy as jnp

import plip_tpu.ops.attention as A
from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig
from plip_tpu.train.contrastive import (init_train_state, make_optimizer,
                                        make_train_step)

PEAK_BF16 = 197e12
_orig_ok = A._flat_pallas_ok


def _r2_gate(N, S, attn_p):
    return S <= 128 and _orig_ok(N, S, attn_p)


def encode_ab(batch=64, arch="l14"):
    cfg = CLIPConfig.vit_b16() if arch == "b16" else CLIPConfig.vit_l14()
    params = jclip.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    px = jnp.asarray(rng.standard_normal((batch, 224, 224, 3)).astype(np.float32))

    def build():
        @jax.jit
        def chain(params, px, n):
            def body(_, p):
                out = jclip.encode_image(params, p, cfg, dtype=jnp.bfloat16)
                return p + (jnp.sum(out) * 1e-20).astype(p.dtype)
            return jnp.sum(jax.lax.fori_loop(0, n, body, px)[0, 0, 0])
        return chain

    # Dispatch does not depend on remat: the knob is the trace-time
    # _flat_pallas_ok gate (as in train_ab). Each variant is its own jit
    # object, traced under its own gate at the first (compiling) call.
    variants = {"padded-flat": (build(), _orig_ok),
                "composed": (build(), _r2_gate)}
    import plip_tpu.models.layers as L
    orig_max_w = L._FLAT_FWD_ONLY_MAX_W
    for tag, (chain, gate) in variants.items():
        A._flat_pallas_ok = gate
        if tag == "padded-flat":  # bypass the fwd-only width gate for the A/B
            L._FLAT_FWD_ONLY_MAX_W = 1 << 20
        t0 = time.perf_counter()
        float(chain(params, px, 1))
        A._flat_pallas_ok = _orig_ok
        L._FLAT_FWD_ONLY_MAX_W = orig_max_w
        print(f"  compiled encode {tag} in {time.perf_counter()-t0:.0f}s",
              flush=True)

    times = {t: [] for t in variants}
    for _ in range(3):
        for tag, (chain, _gate) in variants.items():
            float(chain(params, px, 2))
            t0 = time.perf_counter()
            float(chain(params, px, 10))
            times[tag].append((time.perf_counter() - t0) / 10)
    for tag, ts in times.items():
        best = min(ts)
        print(f"encode {tag:12s}: best {best*1e3:7.1f} ms  "
              f"{batch/best:6,.0f} img/s  (all: {', '.join(f'{t*1e3:.1f}' for t in ts)})",
              flush=True)


def train_ab(batch=64, arch="l14"):
    cfg = CLIPConfig.vit_b16() if arch == "b16" else CLIPConfig.vit_l14()
    params = jclip.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    px = jnp.asarray(rng.standard_normal((batch, 224, 224, 3)).astype(np.float32))
    ids_np = np.zeros((batch, 77), np.int32)
    ids_np[:, 0] = 49406
    ids_np[:, 1] = np.arange(batch) % 49000
    ids_np[:, 2] = 49407
    ids = jnp.asarray(ids_np)
    opt = make_optimizer(total_steps=100)

    # ONE L/14 train state is ~5.1 GB (params+m+v fp32); holding two OOMs
    # the 16 GB chip, so variants run sequentially with the state rebuilt,
    # and the first variant is re-timed at the end to detect drift.
    runners = {}
    for tag, gate in (("padded-flat", _orig_ok), ("r2-composed", _r2_gate)):
        step = make_train_step(cfg, opt, dtype=jnp.bfloat16, remat="mlp")

        @jax.jit
        def steps(state, px, ids, n, _step=step):
            def body(_, s):
                s2, _ = _step(s, px, ids)
                return s2
            return jax.lax.fori_loop(0, n, body, state)

        runners[tag] = (steps, gate)

    def time_one(tag):
        steps, gate = runners[tag]
        # the gate must be LIVE AT TRACE TIME (the first call), not at
        # make_train_step time — closures trace lazily
        A._flat_pallas_ok = gate
        state = init_train_state(jax.tree.map(jnp.copy, params), opt)
        t0 = time.perf_counter()
        s2 = steps(state, px, ids, 2)
        del state
        float(s2.params["logit_scale"])
        A._flat_pallas_ok = _orig_ok
        print(f"  [{tag}] warm+compile {time.perf_counter()-t0:.0f}s", flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            s2 = steps(s2, px, ids, 10)
            float(s2.params["logit_scale"])
            ts.append((time.perf_counter() - t0) / 10)
        del s2
        best = min(ts)
        print(f"train {tag:12s}: best {best*1e3:7.1f} ms  "
              f"{batch/best:6,.0f} pairs/s  (all: {', '.join(f'{t*1e3:.1f}' for t in ts)})",
              flush=True)

    for tag in ("padded-flat", "r2-composed", "padded-flat"):
        time_one(tag)


if __name__ == "__main__":
    if "--train" in sys.argv and "--b16" in sys.argv:
        train_ab(batch=128, arch="b16")
    elif "--train" in sys.argv:
        train_ab()
    elif "--b16" in sys.argv:
        encode_ab(batch=256, arch="b16")
    else:
        encode_ab()
