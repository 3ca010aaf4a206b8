"""Training-step decomposition + MFU + batch-scaling table (VERDICT r1 #10).

All grad timings force the FULL backward by summing first-layer grad leaves
(patch_embed / token_embed) — fetching only logit_scale or last-layer grads
lets XLA DCE the tower backward entirely (measured: 'fwd+bwd' == fwd time).
Timings chain iterations inside one jit (axon defers until host fetch)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp

from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig
from plip_tpu.train.contrastive import (clip_loss, init_train_state,
                                        make_optimizer, make_train_step)

PEAK_BF16 = 197e12


def pair_gflops(cfg):
    def tower(width, layers, S, extra=0.0):
        per_layer = (12 * S * width * width + 2 * S * S * width) * 2
        return (layers * per_layer) / 1e9 + extra

    v, t = cfg.vision, cfg.text
    img = tower(v.width, v.layers, v.seq_len,
                extra=(v.seq_len * v.patch_size ** 2 * 3 * v.width * 2
                       + v.seq_len * v.width * cfg.embed_dim * 2) / 1e9)
    txt = tower(t.width, t.layers, t.context_length,
                extra=(t.context_length * t.width * cfg.embed_dim * 2) / 1e9)
    return img, txt


def chain_timeit(scalar_fn, params, px, ids, iters=10):
    @jax.jit
    def chain(params, px, ids, n):
        def body(_, px_c):
            s = scalar_fn(params, px_c, ids)
            return px_c + (s * 1e-20).astype(px_c.dtype)

        px2 = jax.lax.fori_loop(0, n, body, px)
        return jnp.sum(px2[0, 0, 0])

    float(chain(params, px, ids, 2))
    t0 = time.perf_counter()
    float(chain(params, px, ids, iters))
    return (time.perf_counter() - t0) / iters


def force(g):
    """Scalar depending on EVERY grad leaf. Forcing only the deepest leaves
    (round-1 version) keeps the dx chain but lets XLA DCE the sibling dW
    matmuls (dW_mlp etc. aren't needed to propagate dx) — that probe
    under-measured the true backward by ~25 ms at b512 (see PERF.md r2
    optimizer study)."""
    return sum(jnp.sum(leaf) for leaf in jax.tree.leaves(g))


def main():
    cfg = CLIPConfig.vit_b32()
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    gfl_img, gfl_txt = pair_gflops(cfg)
    gfl_fwd = gfl_img + gfl_txt
    print(f"fwd GFLOP/pair: image {gfl_img:.2f} + text {gfl_txt:.2f} "
          f"= {gfl_fwd:.2f}")
    rng = np.random.default_rng(0)

    # HBM on this chip fragments across sections; run ONE batch size per
    # process (`--batch N`) — the b=512 section OOMed at device_put when run
    # after the full b=256 sweep.
    batches = ((int(sys.argv[sys.argv.index("--batch") + 1]),)
               if "--batch" in sys.argv else (256, 512))
    for batch in batches:
        px = jnp.asarray(rng.standard_normal((batch, 224, 224, 3)).astype(np.float32))
        ids_np = np.zeros((batch, 77), np.int32)
        ids_np[:, 0] = 49406
        ids_np[:, 1] = np.arange(batch) % 49000
        ids_np[:, 2] = 49407
        ids = jnp.asarray(ids_np)
        iters = 10

        dt = chain_timeit(
            lambda p, x, i: clip_loss(p, x, i, cfg, jnp.bfloat16, False)[0],
            params, px, ids, iters)
        print(f"b={batch} fwd-only:            {dt*1e3:7.1f} ms "
              f"{batch/dt:7,.0f} pairs/s (fwd MFU "
              f"{batch*gfl_fwd*1e9/dt/PEAK_BF16*100:.0f}%)")

        for remat, name in ((True, "remat   "), (False, "no-remat")):
            def grad_scalar(p, x, i, _r=remat):
                g = jax.grad(lambda q: clip_loss(q, x, i, cfg, jnp.bfloat16,
                                                 _r)[0])(p)
                return force(g)

            try:
                dt = chain_timeit(grad_scalar, params, px, ids, iters)
                fx = 4 if remat else 3
                print(f"b={batch} fwd+bwd {name}:    {dt*1e3:7.1f} ms "
                      f"{batch/dt:7,.0f} pairs/s (MFU "
                      f"{batch*3*gfl_fwd*1e9/dt/PEAK_BF16*100:.0f}%@3x)")
            except Exception as e:
                print(f"b={batch} fwd+bwd {name}: failed {type(e).__name__}")

        # image / text tower isolation (forced, remat)
        def img_scalar(p, x, i):
            def loss(q):
                emb = jclip.encode_image(q, x, cfg, jnp.bfloat16, remat=True)
                return jnp.sum(emb.astype(jnp.float32) ** 2) * 1e-6

            return force(jax.grad(loss)(p))

        dt = chain_timeit(img_scalar, params, px, ids, iters)
        print(f"b={batch} image fwd+bwd:       {dt*1e3:7.1f} ms "
              f"({batch*3*gfl_img*1e9/dt/PEAK_BF16*100:.0f}%@3x)")

        def txt_scalar(p, x, i):
            def loss(q):
                emb = jclip.encode_text(q, i, cfg, jnp.bfloat16, remat=True)
                return jnp.sum(emb.astype(jnp.float32) ** 2) * 1e-6

            return force(jax.grad(loss)(p)) + x[0, 0, 0] * 0

        dt = chain_timeit(txt_scalar, params, px, ids, iters)
        print(f"b={batch} text fwd+bwd:        {dt*1e3:7.1f} ms "
              f"({batch*3*gfl_txt*1e9/dt/PEAK_BF16*100:.0f}%@3x)")

        # grads + loss only vs full step -> optimizer cost
        opt = make_optimizer(total_steps=100)
        state = init_train_state(params, opt)
        step = make_train_step(cfg, opt, dtype=jnp.bfloat16, remat=True)

        @jax.jit
        def steps(state, px, ids, n):
            def body(_, s):
                s2, _ = step(s, px, ids)
                return s2

            return jax.lax.fori_loop(0, n, body, state)

        s2 = steps(state, px, ids, 2)
        float(s2.params["logit_scale"])
        t0 = time.perf_counter()
        s3 = steps(s2, px, ids, iters)
        float(s3.params["logit_scale"])
        dt = (time.perf_counter() - t0) / iters
        print(f"b={batch} full step (remat):   {dt*1e3:7.1f} ms "
              f"{batch/dt:7,.0f} pairs/s (MFU "
              f"{batch*3*gfl_fwd*1e9/dt/PEAK_BF16*100:.0f}%@3x)")
        del state, s2, s3

        step_nr = make_train_step(cfg, opt, dtype=jnp.bfloat16, remat=False)
        state = init_train_state(params, opt)

        @jax.jit
        def steps_nr(state, px, ids, n):
            def body(_, s):
                s2, _ = step_nr(s, px, ids)
                return s2

            return jax.lax.fori_loop(0, n, body, state)

        try:
            s2 = steps_nr(state, px, ids, 2)
            float(s2.params["logit_scale"])
            t0 = time.perf_counter()
            s3 = steps_nr(s2, px, ids, iters)
            float(s3.params["logit_scale"])
            dt = (time.perf_counter() - t0) / iters
            print(f"b={batch} full step (no-remat): {dt*1e3:6.1f} ms "
                  f"{batch/dt:7,.0f} pairs/s")
            del s2, s3
        except Exception as e:
            print(f"b={batch} full step (no-remat): failed {type(e).__name__}")
        del state


if __name__ == "__main__":
    main()
