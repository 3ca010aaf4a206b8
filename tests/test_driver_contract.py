"""Guards for the driver contract files (__graft_entry__, bench shape)."""

import json
import subprocess
import sys

import pytest


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # raises on failure


def test_entry_returns_jittable():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    # trace-only check (full ViT-B/32 compile is exercised by the driver/bench)
    shapes = jax.eval_shape(fn, *args)
    li, lt = shapes
    assert li.shape == (8, 8)
    assert lt.shape == (8, 8)


def test_fine_tuning_eval_head(tmp_path):
    """The (reference-empty) fine-tuning eval head actually works here."""
    np = pytest.importorskip("numpy")
    pd = pytest.importorskip("pandas")
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    import jax

    from plip_tpu.eval.fine_tuning import FineTuningClassifier
    from plip_tpu.models import clip as jclip
    from plip_tpu.models.config import CLIPConfig, TextConfig, VisionConfig
    from plip_tpu.utils.checkpoint import save_checkpoint

    cfg = CLIPConfig(
        vision=VisionConfig(width=32, layers=1, heads=2, image_size=224, patch_size=32),
        text=TextConfig(width=32, layers=1, heads=2, vocab_size=512, context_length=16),
        embed_dim=8,
    )
    ckpt = str(tmp_path / "b.npz")
    save_checkpoint(ckpt, jclip.init_params(jax.random.PRNGKey(0), cfg), cfg)

    rng = np.random.default_rng(0)
    paths, labels = [], []
    for i in range(8):
        p = str(tmp_path / f"i{i}.png")
        Image.fromarray(rng.integers(0, 256, (224, 224, 3), dtype=np.uint8)).save(p)
        paths.append(p)
        labels.append("ab"[i % 2])

    clf = FineTuningClassifier(backbone=ckpt, epochs=1, batch_size=4)
    _, (test_m, train_m) = clf.train_and_test(paths, labels, paths, labels)
    assert 0.0 <= test_m["Accuracy"] <= 1.0
    assert test_m["split"] == "test"


def test_distributed_initialize_single_process():
    from plip_tpu.parallel.distributed import initialize, local_batch_slice

    assert initialize() in (False, True)  # must not raise single-process
    s = local_batch_slice(16)
    assert s == slice(0, 16)
