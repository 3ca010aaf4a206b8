"""Streaming WSI demo: tile a (synthetic) slide, filter background, stream
tiles through the encoder, make per-tile zero-shot calls, then run text->tile
retrieval over the slide's own tile index (the full WSI pipeline:
data/wsi.py tiler -> encoder -> ops/retrieval.py streaming top-k).

``--bench`` scales the slide up (~35x more tiles) and prints end-to-end
timings (tiles/s through embed_wsi; ms per retrieval query batch). NOTE on
tunneled rigs (CLAUDE.md): embed_wsi e2e is host/H2D-bound there, and one
retrieval call is pinned at the tunnel RTT — the numbers measure the rig,
not the kernels (see PERF.md's RTT-free retrieval table for those).
"""

import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_slide(scale: int = 1) -> np.ndarray:
    rng = np.random.default_rng(0)
    # synthetic "slide": tissue blob on white background
    slide = np.full((1568 * scale, 2016 * scale, 3), 245, np.uint8)
    slide[300 * scale:1200 * scale, 400 * scale:1600 * scale] = rng.integers(
        60, 180, (900 * scale, 1200 * scale, 3), np.uint8)
    return slide


def main():
    bench = "--bench" in sys.argv
    slide = make_slide(scale=6 if bench else 1)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        from plip import PLIP

        model = PLIP("random:ViT-B/32")

    from plip_tpu.data.wsi import embed_wsi

    t0 = time.perf_counter()
    emb, coords = embed_wsi(
        model, slide, batch_size=64 if bench else 16, tile=224, overlap=0.0,
        non_bg_threshold=0.5,
    )
    dt = time.perf_counter() - t0
    print(f"slide {slide.shape[:2]} -> {len(emb)} tissue tiles embedded "
          f"(background filtered) in {dt:.2f}s ({len(emb) / dt:.0f} tiles/s "
          f"e2e incl. tiling+transfer)")

    prompts = ["an H&E image of tumor", "an H&E image of normal tissue"]
    txt = model.encode_text(prompts, batch_size=2)
    txt = txt / np.linalg.norm(txt, axis=-1, keepdims=True)
    scores = emb @ txt.T
    calls = np.argmax(scores, -1)
    for (y, x), c in list(zip(coords, calls))[:5]:
        print(f"tile at (y={y}, x={x}): {prompts[c]}")
    print(f"... tumor-called fraction: {np.mean(calls == 0):.2f}")

    # text->tile retrieval over the slide's own index: which tiles best
    # match each prompt. Device streaming top-k (forced — the auto gate
    # would pick host at this N; same indices either way). --bench also
    # exercises the int8 device index (4x less HBM; exact host rescore).
    model.set_image_index(emb, quantize="int8" if bench else False)
    k = min(5, len(emb))
    backend = "device" if bench else "auto"
    top = model.retrieval(prompts, top_k=k, backend=backend)
    if bench:
        t0 = time.perf_counter()
        for _ in range(5):
            top = model.retrieval(prompts, top_k=k, backend="device")
        dt = (time.perf_counter() - t0) / 5
        print(f"retrieval (device streaming top-k, N={len(emb)}, "
              f"Q={len(prompts)}): {dt * 1e3:.1f} ms/call one-shot "
              f"(tunnel-RTT-bound on this rig)")
    for qi, prompt in enumerate(prompts):
        ys, xs = zip(*(coords[i] for i in top[qi]))
        print(f"top-{k} tiles for {prompt!r}: "
              + ", ".join(f"(y={y},x={x})" for y, x in zip(ys, xs)))


if __name__ == "__main__":
    main()
