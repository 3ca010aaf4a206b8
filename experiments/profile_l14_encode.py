"""Profile ViT-L/14 ENCODE (composed path, the shipped L/14 dispatch) on the
axon TPU and print the per-scan decomposition + top ops, to aim the round-4
flash-kernel work at the real gap (VERDICT r3 #1). Method = the round-3
profiler recipe that overturned the B/32 backward attribution."""

import sys

from _harness import setup, sync

setup()

import numpy as np
import jax
import jax.numpy as jnp

from plip_tpu.models import clip as jclip
from plip_tpu.models.config import CLIPConfig


def main():
    batch = (int(sys.argv[sys.argv.index("--batch") + 1])
             if "--batch" in sys.argv else 128)
    arch = (sys.argv[sys.argv.index("--arch") + 1]
            if "--arch" in sys.argv else "vit_l14")
    outdir = f"/tmp/jaxtrace_{arch}_encode_b{batch}"
    cfg = getattr(CLIPConfig, arch)()
    params = jclip.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    px = jnp.asarray(rng.standard_normal(
        (batch, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32))

    enc = jax.jit(lambda p, x: jclip.encode_image(p, x, cfg, jnp.bfloat16))
    out = enc(params, px)
    sync(out)
    print("warm done", flush=True)
    with jax.profiler.trace(outdir):
        for _ in range(3):
            out = enc(params, px + out[0, 0] * 1e-20)
        sync(out)
    print("trace done", flush=True)

    from plip_tpu.utils.profiling import parse_device_trace

    dec = parse_device_trace(outdir, n_steps=3, step_prefix="jit_")
    total = dec["step_total_ms"]
    print(f"encode total: {total:.2f} ms/batch  "
          f"({batch / total * 1000:.0f} img/s)")
    for wn in sorted(dec["groups"]):
        g = dec["groups"][wn]
        print(f"\n=== {wn}: {g['total_ms']:.2f} ms/step ===")
        for n, d in g["ops"][:12]:
            print(f"  {d:7.3f} ms/step  {n[:100]}")
    print(f"\noutside-scan {dec['outside_ms']:.2f} ms")


if __name__ == "__main__":
    main()
