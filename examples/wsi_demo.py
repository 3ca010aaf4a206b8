"""Streaming WSI embedding demo: tile a (synthetic) slide, filter background,
stream tiles through the encoder, and report per-tile zero-shot calls."""

import os
import sys
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    rng = np.random.default_rng(0)
    # synthetic 1568x2016 "slide": tissue blob on white background
    slide = np.full((1568, 2016, 3), 245, np.uint8)
    slide[300:1200, 400:1600] = rng.integers(60, 180, (900, 1200, 3), np.uint8)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        from plip import PLIP

        model = PLIP("random:ViT-B/32")

    from plip_tpu.data.wsi import embed_wsi

    emb, coords = embed_wsi(
        model, slide, batch_size=16, tile=224, overlap=0.0,
        non_bg_threshold=0.5,
    )
    print(f"slide {slide.shape[:2]} -> {len(emb)} tissue tiles embedded "
          f"(background filtered)")

    prompts = ["an H&E image of tumor", "an H&E image of normal tissue"]
    txt = model.encode_text(prompts, batch_size=2)
    txt = txt / np.linalg.norm(txt, axis=-1, keepdims=True)
    scores = emb @ txt.T
    calls = np.argmax(scores, -1)
    for (y, x), c in list(zip(coords, calls))[:5]:
        print(f"tile at (y={y}, x={x}): {prompts[c]}")
    print(f"... tumor-called fraction: {np.mean(calls == 0):.2f}")


if __name__ == "__main__":
    main()
