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
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_IMG_PER_SEC = 5000.0


def main():
    from plip_tpu.models import clip as jclip
    from plip_tpu.models.config import CLIPConfig

    batch = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 512
    iters = int(sys.argv[sys.argv.index("--iters") + 1]) if "--iters" in sys.argv else 30

    cfg = CLIPConfig.vit_b32()
    params = jclip.init_params(jax.random.PRNGKey(0), cfg)

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
                "metric": "vit_b32_encode_images_per_sec_per_chip",
                "value": round(img_per_sec, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
