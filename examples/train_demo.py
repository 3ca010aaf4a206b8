"""Contrastive fine-tuning demo — the BASELINE config-5 flow, scaled down.

Builds a toy image/caption dataset, runs CLIPTuner for two epochs with the
device-side augmentation pipeline, writes per-epoch checkpoints, and shows
resume. Add --mesh dpxtp to train data/tensor-parallel (e.g. --mesh 4x2 with
8 devices; on CPU run with
XLA_FLAGS=--xla_force_host_platform_device_count=8).
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None, help="backbone to start from")
    p.add_argument("--mesh", default=None, help="e.g. 4x2 for dp=4,tp=2")
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--batch-size", type=int, default=4)
    args = p.parse_args()

    import pandas as pd
    from PIL import Image

    d = tempfile.mkdtemp()
    rng = np.random.default_rng(0)
    rows = []
    for i in range(8):
        path = os.path.join(d, f"{i}.jpg")
        Image.fromarray(rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)).save(path)
        rows.append({"image": path, "caption": f"an H&E image of class {i % 2}"})
    df = pd.DataFrame(rows)

    mesh = None
    if args.mesh:
        from plip_tpu.parallel.mesh import create_mesh

        dp, tp = (int(v) for v in args.mesh.split("x"))
        mesh = create_mesh(dp=dp, tp=tp)

    from types import SimpleNamespace

    from plip_tpu.train.clip_tuner import CLIPTuner

    tuner = CLIPTuner(
        args=SimpleNamespace(first_resize=256, pxsize=224, optimizer="AdamW"),
        backbone=args.checkpoint,
        model_type="ViT-B/32",
        lr=1e-5,
        warmup=2,
        mesh=mesh,
    )
    suffix = tuner.tuner(
        df, df.iloc[:4], save_directory=d, batch_size=args.batch_size,
        epochs=args.epochs, evaluation_steps=0, num_workers=4,
        start_time="demo", save_full_state=True,
    )
    print("checkpoint suffix:", suffix)
    print("checkpoints:", sorted(f for f in os.listdir(d) if f.endswith(".npz")))

    # resume for one more epoch from the last checkpoint
    last = os.path.join(d, f"epoch_{args.epochs - 1}_demo_model.npz")
    tuner.tuner(
        df, df.iloc[:4], save_directory=d, batch_size=args.batch_size,
        epochs=1, evaluation_steps=0, start_time="resumed",
        resume_from=last,
    )
    print("resumed fine; step =", int(tuner.state.step))


if __name__ == "__main__":
    main()
