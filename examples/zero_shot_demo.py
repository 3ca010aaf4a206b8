"""Zero-shot classification demo — the BASELINE config-1 flow.

Usage:
    python examples/zero_shot_demo.py [--checkpoint path] [images...]

Without arguments, synthesizes 8 demo JPEGs and uses a deterministic
random-init ViT-B/32 (this environment has no network for real weights; pass
--checkpoint for a real model in either torch naming scheme or native .npz).
"""

import argparse
import os
import sys
import tempfile
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default="random:ViT-B/32")
    p.add_argument("images", nargs="*")
    args = p.parse_args()

    images = args.images
    if not images:
        from PIL import Image

        d = tempfile.mkdtemp()
        rng = np.random.default_rng(0)
        for i in range(8):
            path = os.path.join(d, f"demo_{i}.jpg")
            Image.fromarray(
                rng.integers(0, 256, (224, 224, 3), dtype=np.uint8)
            ).save(path)
            images.append(path)
        print(f"(no images given — synthesized 8 demo tiles under {d})")

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        from plip import PLIP

        model = PLIP(args.checkpoint)

    prompts = [
        "an H&E image of benign tissue",
        "an H&E image of malignant tissue",
        "an H&E image of adipose tissue",
        "an H&E image of stroma",
    ]
    preds = model.zero_shot_classification(images, prompts)
    for path, pred in zip(images, preds):
        print(f"{os.path.basename(path)}: {pred}")

    # logits softmax, HF-README style
    img = model.encode_images(images, batch_size=8)
    txt = model.encode_text(prompts, batch_size=4)
    img = img / np.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / np.linalg.norm(txt, axis=-1, keepdims=True)
    logits = 100.0 * img @ txt.T
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    print("\nsoftmax probabilities (rows=images, cols=prompts):")
    print(np.round(probs, 3))


if __name__ == "__main__":
    main()
