"""Benchmark: ViT-B/32 image-encode throughput (images/sec/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the BASELINE.json north-star target of
5,000 images/sec/chip on TPU v5e.

Measures the steady-state jitted encode path (bf16 compute, fp32 params,
device-resident preprocessed pixels) — the hot loop of
``PLIP.encode_images`` / the reference's ``model.get_image_features`` loop
(`/root/reference/plip.py:50`).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import jax

from plip_tpu.utils.compile_cache import enable_from_env

enable_from_env()  # PLIP_TPU_COMPILE_CACHE=1 skips the ~3 min cold compile

import jax.numpy as jnp

BASELINE_IMG_PER_SEC = 5000.0


def latency_mode():
    """p50 zero-shot classification latency (BASELINE.json tracked metric):
    one 224x224 image vs 4 label prompts, full device path (preprocess +
    both towers + similarity), single-request latency."""
    import jax.numpy as jnp

    from plip_tpu.models import clip as jclip
    from plip_tpu.models.config import CLIPConfig
    from plip_tpu.ops.preprocess import preprocess_batch
    from plip_tpu.tokenizer import default_tokenizer

    cfg = CLIPConfig.vit_b32()
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    tok = default_tokenizer()
    ids = jnp.asarray(tok.tokenize([f"an H&E image of class {i}" for i in range(4)]))
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 256, (1, 256, 256, 3), dtype=np.uint8))

    @jax.jit
    def zero_shot(params, raw, ids):
        from plip_tpu.ops.resize import resize_crop_matrices

        R, C = resize_crop_matrices(256, 256, 224, 224)
        px = preprocess_batch(raw)
        img = jclip.l2_normalize(jclip.encode_image(params, px, cfg, jnp.bfloat16))
        txt = jclip.l2_normalize(jclip.encode_text(params, ids, cfg, jnp.bfloat16))
        return jnp.argmax(img @ txt.T, -1)[0]

    int(zero_shot(params, raw, ids))  # compile
    lats = []
    for _ in range(30):
        t0 = time.perf_counter()
        int(zero_shot(params, raw, ids))  # scalar fetch = sync on axon
        lats.append(time.perf_counter() - t0)
    lats.sort()
    p50 = lats[len(lats) // 2] * 1000
    print(
        json.dumps(
            {
                "metric": "p50_zero_shot_classification_latency",
                "value": round(p50, 2),
                "unit": "ms",
                "vs_baseline": None,
            }
        )
    )


def train_mode():
    """Contrastive train-step throughput (fwd+bwd+AdamW), pairs/sec/chip."""
    import jax.numpy as jnp

    from plip_tpu.models import clip as jclip
    from plip_tpu.models.config import CLIPConfig
    from plip_tpu.train.contrastive import (
        clip_loss,
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    batch = 512
    iters = 10
    cfg = CLIPConfig.vit_b32()
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(base_lr=1e-5, warmup=10, total_steps=1000)
    state = init_train_state(params, opt)
    # MLP-half remat: fastest fitting policy on one v5e chip (PERF.md r2)
    step = make_train_step(cfg, opt, dtype=jnp.bfloat16, remat="mlp")

    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal((batch, 224, 224, 3)).astype(np.float32))
    ids = np.zeros((batch, 77), np.int32)
    ids[:, 0] = 49406
    ids[:, 1:5] = rng.integers(1, 49000, (batch, 4))
    ids[:, 5] = 49407
    ids = jnp.asarray(ids)

    state, m = step(state, px, ids)
    float(m["loss"])  # sync (compile + 1 step)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, px, ids)
    float(m["loss"])  # metrics depend on the full chain of steps
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": "vit_b32_infonce_train_pairs_per_sec_per_chip",
                "value": round(batch * iters / dt, 1),
                "unit": "pairs/sec/chip",
                "vs_baseline": None,
            }
        )
    )


def main():
    from plip_tpu.models import clip as jclip
    from plip_tpu.models.config import CLIPConfig

    if "--mode" in sys.argv and sys.argv[sys.argv.index("--mode") + 1] == "latency":
        latency_mode()
        return
    if "--mode" in sys.argv and sys.argv[sys.argv.index("--mode") + 1] == "train":
        train_mode()
        return

    on_cpu = jax.default_backend() == "cpu"
    # Measured per-arch batch optima on v5e: 256 is the B-width flat-kernel
    # sweet spot (15,020 img/s vs 14,705 at 512, 14,135 at 128 — PERF.md r2);
    # L/14 peaks at 64 (844 img/s vs 769 at 128, r4 sweep in
    # experiments/bench_l14_encode_sweep.py); 336px at 32.
    arch_default = {"vit_l14": 64, "vit_l14_336": 32}
    batch = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else (
        16 if on_cpu else arch_default.get(
            (sys.argv[sys.argv.index("--arch") + 1]
             if "--arch" in sys.argv else "vit_b32"), 256)
    )
    iters = int(sys.argv[sys.argv.index("--iters") + 1]) if "--iters" in sys.argv else (
        2 if on_cpu else 30
    )
    # --arch vit_b32|vit_b16|vit_l14|vit_l14_336 (headline metric is B/32)
    arch = (sys.argv[sys.argv.index("--arch") + 1]
            if "--arch" in sys.argv else "vit_b32")

    cfg = getattr(CLIPConfig, arch)()
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)
    if "--quantize" in sys.argv:  # w8a8: L/14 1,204 img/s b32 (PERF.md r4)
        qi = sys.argv.index("--quantize")
        if qi + 1 >= len(sys.argv) or sys.argv[qi + 1] != "w8a8":
            raise ValueError("--quantize takes exactly one value: 'w8a8'")
        from plip_tpu.ops.quant import quantize_block_linears

        params = {**params,
                  "visual": {**params["visual"],
                             "blocks": quantize_block_linears(
                                 params["visual"]["blocks"])}}
        if "--batch" not in sys.argv:
            # measured W8A8 optima (bench_l14_int8_r4.py + @336 sweep)
            batch = {"vit_l14": 32, "vit_l14_336": 16}.get(arch, batch)
        arch = f"{arch}_w8a8"

    # The axon platform defers execution until a host fetch, so we chain all
    # iterations inside ONE jit (each step's input depends on the previous
    # step's output — un-removable, un-reorderable) and fetch a single scalar
    # at the end. float(scalar) is the only reliable sync point here
    # (block_until_ready is a no-op on this platform).
    @jax.jit
    def bench_chain(params, pixels, n):
        def body(_, px):
            out = jclip.encode_image(params, px, cfg, dtype=jnp.bfloat16)
            return px + (jnp.sum(out) * 1e-20).astype(px.dtype)

        px = jax.lax.fori_loop(0, n, body, pixels)
        return jnp.sum(px[0, 0, 0])

    rng = np.random.default_rng(0)
    pixels = jnp.asarray(
        rng.standard_normal(
            (batch, cfg.vision.image_size, cfg.vision.image_size, 3)
        ).astype(np.float32)
    )

    float(bench_chain(params, pixels, 2))  # compile + warmup

    t0 = time.perf_counter()
    float(bench_chain(params, pixels, iters))
    dt = time.perf_counter() - t0

    img_per_sec = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": f"{arch}_encode_images_per_sec_per_chip",
                "value": round(img_per_sec, 1),
                "unit": "images/sec/chip",
                # the 5k north star is a ViT-B/32 target; other archs report
                # raw throughput only
                "vs_baseline": (round(img_per_sec / BASELINE_IMG_PER_SEC, 3)
                                if arch == "vit_b32" else None),
            }
        )
    )


if __name__ == "__main__":
    main()
