"""Export a plip_tpu checkpoint back to the PyTorch reference ecosystem.

The reference's checkpoint currency is torch state_dicts: its eval harness
loads tuned weights via ``torch.load`` + ``load_state_dict``
(`/root/reference/reproducibility/embedders/factory.py:21-26`) and its
trainer publishes ``torch.save(model.state_dict())`` per epoch
(`/root/reference/reproducibility/training_model/clip.py:221-222`). This CLI
closes the loop: a model fine-tuned on TPU (native ``.npz`` or an orbax
train-state directory) becomes a drop-in torch artifact in either naming.

Usage::

    python -m plip_tpu.scripts.export_checkpoint SRC OUT.pt [--naming openai|hf]

``SRC`` is a native ``.npz`` checkpoint or an orbax checkpoint directory
written by ``save_full_state="orbax"`` (only the params subtree is read —
no optimizer reconstruction needed).
"""

from __future__ import annotations

import argparse
import os
import sys


def _load_params_any(src: str):
    """(params, cfg) from a native .npz or an orbax train-state dir."""
    if os.path.isdir(src):
        import jax
        import orbax.checkpoint as ocp

        from ..utils.checkpoint import cfg_from_json

        with open(os.path.join(src, "clip_config.json")) as f:
            cfg = cfg_from_json(f.read())
        ckptr = ocp.StandardCheckpointer()
        try:
            meta = ckptr.metadata(os.path.abspath(src)).item_metadata
            tgt = jax.tree.map(
                lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype), dict(meta)
            )
            out = ckptr.restore(os.path.abspath(src), target=tgt)
        finally:
            ckptr.close()
        return out["params"], cfg
    from ..utils.checkpoint import load_checkpoint

    return load_checkpoint(src)


def main(argv=None) -> str:
    parser = argparse.ArgumentParser(
        description="Export a plip_tpu checkpoint (.npz or orbax dir) as a "
        "PyTorch state_dict the reference harness can torch.load."
    )
    parser.add_argument("src", type=str, help=".npz file or orbax directory")
    parser.add_argument("out", type=str, help="output torch file (.pt)")
    parser.add_argument(
        "--naming", choices=("openai", "hf"), default="openai",
        help="state_dict key layout: 'openai' (the reference repro "
        "harness's format, default) or 'hf' (transformers.CLIPModel)",
    )
    args = parser.parse_args(argv)

    from ..utils.checkpoint import save_torch_checkpoint

    params, cfg = _load_params_any(args.src)
    path = save_torch_checkpoint(args.out, params, cfg, naming=args.naming)
    print(f"wrote {args.naming} state_dict: {path}")
    return path


if __name__ == "__main__":
    main(sys.argv[1:])
